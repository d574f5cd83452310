"""Hoisted static-ISP precompute: run a deterministic pipeline over a
dataset ONCE and reuse the result everywhere it is loop-invariant.

The reference re-executes its numpy ISP per image per epoch inside 16
DataLoader workers (reference train.py:163-173, 318-320) and per table
cell inside the A/B harness (reference figures/ABtesting.py:175-226).
Both uses are loop-invariant in the pipeline output: a static pipeline is
deterministic, augmentation is applied AFTER processing (reference
model.py:77-83), and the A/B corruptions act on the processed RGB. So on
a single-program-at-a-time backend the XLA-native structure is to compute
each (pipeline, dataset) product exactly once through one jitted batched
program and feed every consumer from the cached array:

  * training (``train.py --precompute_static``): the per-step graph
    shrinks to augmentation + task model — the demosaic/sharpen/denoise
    FLOPs leave the epoch loop entirely;
  * evaluation (``evaluation/abtesting.py``): a table cell's program
    shrinks to corruption + normalize + classifier, so the C battery's
    660 cells share 55 compiled programs (one per corruption x severity)
    instead of one per cell, and the A/B matrix's 144 cells share ONE.
"""

import numpy as np

import jax
import jax.numpy as jnp


def precompute_pipeline_rgb(dataset, pipeline, batch_size=16, indices=None):
    """Run ``pipeline`` over ``dataset`` images once, batched through one
    jitted program (final partial batch padded so a ragged shape never
    triggers a second compile). Returns float32 (N, H, W, 3) aligned with
    ``indices`` (default: the whole dataset)."""
    idxs = (list(range(len(dataset))) if indices is None else
            [int(i) for i in indices])
    batch_size = max(1, min(int(batch_size), len(idxs)))
    run = jax.jit(lambda raw: pipeline(raw))
    out = None
    for s in range(0, len(idxs), batch_size):
        chunk = idxs[s:s + batch_size]
        raw = np.stack([np.asarray(dataset[i][0], np.float32)
                        for i in chunk])
        n = raw.shape[0]
        if n < batch_size:
            raw = np.concatenate(
                [raw, np.repeat(raw[:1], batch_size - n, axis=0)], axis=0)
        rgb = np.asarray(run(jnp.asarray(raw)))[:n]
        if out is None:
            out = np.empty((len(idxs),) + rgb.shape[1:], np.float32)
        out[s:s + n] = rgb
    return out


class PrecomputedRGBView:
    """Dataset view yielding ``(precomputed_rgb[i], label)``.

    ``rgb`` must be aligned with the base dataset's indices (the output of
    :func:`precompute_pipeline_rgb` with default indices). Labels resolve
    through the base dataset's ``labels`` list when present (synthetic
    datasets regenerate the image inside ``__getitem__`` — reading only
    the label must not pay that); everything else (``task``, ``classes``,
    ``camera_parameters``, ``images``) proxies through."""

    def __init__(self, dataset, rgb):
        self.dataset = dataset
        self.rgb = np.asarray(rgb, np.float32)
        if len(self.rgb) != len(dataset):
            raise ValueError(f"rgb rows ({len(self.rgb)}) != dataset size "
                             f"({len(dataset)})")

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, i):
        labels = getattr(self.dataset, "labels", None)
        if labels is not None:
            return self.rgb[i], labels[i]
        return self.rgb[i], self.dataset[i][1]

    def __getattr__(self, name):
        if name in ("dataset", "rgb"):  # guard: partially-initialized
            raise AttributeError(name)
        return getattr(self.dataset, name)
