"""raw2logit_tpu — TPU-native raw→logit framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
aiaudit-org/raw2logit ("Data Models for Dataset Drift Controls in Machine
Learning With Optical Images", TMLR 2023): differentiable and static ISP
pipelines (raw Bayer mosaic → RGB), coupled task models (ResNet classifiers,
U-Net++ segmenters), drift synthesis / forensics / optimization experiment
harnesses — all as one pjit-compiled computational graph on TPU.

Key design differences vs the reference (deliberate, TPU-first):
  * NHWC layout everywhere (TPU-native), not NCHW.
  * Processors are pure functions / flax modules returning ``(rgb, stages)``
    instead of stateful ``self.stages`` (reference:
    processing/pipeline_torch.py:175-225).
  * Per-stage gradient tracking via explicit zero-valued "taps" added after
    each stage (grads w.r.t. taps == grads w.r.t. stage outputs), replacing
    torch ``retain_grad`` (reference: processing/pipeline_torch.py:219-221).
  * Randomness via explicit ``jax.random`` keys, replacing global-RNG
    reseeding (reference: utils/augmentation.py:39-67).
  * Batch data-parallelism via a ``jax.sharding.Mesh`` + jitted train step
    (the reference is strictly single-GPU, train.py:361-368).
"""

__version__ = "0.1.0"

from raw2logit_tpu.ops import constants  # noqa: F401
