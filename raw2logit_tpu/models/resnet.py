"""ResNet-18/34/50 in flax (NHWC, bfloat16-friendly).

Capability parity with the reference's torchvision classifiers
(model.py:15-23), with the fc-head replaced for the task's class count.
Fixes the reference's latent bug of hardcoding fc in_features=512 (wrong for
ResNet-50, model.py:22) by using block expansion.

TPU notes: convs run in NHWC; compute dtype is configurable (bfloat16 puts
the 7x7/3x3 convs on the MXU at full rate; params stay float32).
"""

import os
from functools import partial
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

ModuleDef = Any


def stem_max_pool(y, two_stage=False):
    """The stem's 3x3/2 maxpool (torchvision layout: pad 1 both sides).

    two_stage=True applies the exact algebraic decomposition
    3x3/2(pad 1) == [2x2/1, pad (1,0)] then [2x2/2, VALID]: per axis,
    max(a[2i], a[2i+1]) with a[j] = max(x[j-1], x[j]) covers
    x[2i-1..2i+1] — identical taps, so outputs are bit-equal. The idea
    was to replace the 3x3/2 backward's overlapping select-and-scatter
    with two small ones (one non-overlapping). MEASURED DEAD END on the
    chip: 24.3 ms fwd+bwd vs 7.3 ms for the canonical 3x3 at batch 256
    bf16 (tools/pool_micro.py -> results/pool_micro.json) — the
    intermediate (B,129,129,64) plane costs more HBM traffic than the
    overlap saves. Kept (default off) as the documented probe; joins
    round 3's gather rewrite (26.9 ms) and space-to-depth stem as
    measured stem dead ends.
    """
    # the decomposition covers the last row/column differently when a
    # spatial dim is odd (output would shrink by one), so it only applies
    # to even dims — always true for the 256x256 contract (stem is 128)
    if not two_stage or y.shape[1] % 2 or y.shape[2] % 2:
        return nn.max_pool(y, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))
    a = nn.max_pool(y, (2, 2), strides=(1, 1), padding=((1, 0), (1, 0)))
    return nn.max_pool(a, (2, 2), strides=(2, 2), padding="VALID")


class BasicBlock(nn.Module):
    filters: int
    strides: Tuple[int, int] = (1, 1)
    conv: ModuleDef = None
    norm: ModuleDef = None

    expansion = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (3, 3), self.strides)(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3))(y)
        y = self.norm(scale_init=nn.initializers.zeros_init())(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters, (1, 1), self.strides,
                                 name="downsample_conv")(residual)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    strides: Tuple[int, int] = (1, 1)
    conv: ModuleDef = None
    norm: ModuleDef = None

    expansion = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1))(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), self.strides)(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters * 4, (1, 1))(y)
        y = self.norm(scale_init=nn.initializers.zeros_init())(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters * 4, (1, 1), self.strides,
                                 name="downsample_conv")(residual)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


RESNET_CONFIGS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet34": (BasicBlock, (3, 4, 6, 3)),
    "resnet50": (Bottleneck, (3, 4, 6, 3)),
}


class _StemConvParams(nn.Module):
    """Parameter holder matching nn.Conv's tree (params/<name>/kernel) for
    the fused Pallas stem — same shape, init, and name as conv_init, so
    checkpoints are interchangeable between stem implementations."""

    features: int = 64

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (7, 7, 3, self.features), jnp.float32)


class _StemBNPool(nn.Module):
    """BN params/batch-stats holder (tree-identical to nn.BatchNorm's
    bn_init) that runs the fused Pallas stem (pallas/stem.py: conv + BN +
    relu + 3x3/2 maxpool in two kernel passes) and applies the flax
    running-stat update (momentum * ra + (1-momentum) * batch)."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, kernel):
        from raw2logit_tpu.pallas.stem import stem_eval, stem_train
        features = kernel.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(),
                           (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))
        if self.use_running_average or self.is_initializing():
            return stem_eval(x, kernel, scale, bias, ra_mean.value,
                             ra_var.value, self.epsilon, self.dtype, None)
        pooled, bm, bv = stem_train(x, kernel, scale, bias, self.epsilon,
                                    self.dtype, None)
        ra_mean.value = (self.momentum * ra_mean.value
                         + (1 - self.momentum) * bm)
        ra_var.value = (self.momentum * ra_var.value
                        + (1 - self.momentum) * bv)
        return pooled


class ResNet(nn.Module):
    """ResNet backbone + linear head.

    __call__(x, train) -> logits.
    features(x, train) -> [identity, stem(1/2), c2(1/4), c3(1/8), c4(1/16),
    c5(1/32)] for U-Net++ encoders.
    """

    block_cls: ModuleDef = BasicBlock
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 2
    num_filters: int = 64
    in_channels: int = 3
    dtype: Any = jnp.float32
    # exact 2-stage stem-pool decomposition (see stem_max_pool); parameter
    # trees are identical either way, so the flag is checkpoint-compatible
    pool_two_stage: bool = False
    # fused Pallas stem (pallas/stem.py): conv_init + bn_init + relu +
    # maxpool as two kernel passes; parameter/batch-stats trees are
    # identical to the flax stem, so the flag is checkpoint-compatible.
    # Classifier path only (the features path needs the pre-pool plane).
    stem_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True, return_features: bool = False,
                 depth: int = 5):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       padding="SAME")

        feats = [x]
        if self.stem_pallas and not return_features:
            kernel = _StemConvParams(self.num_filters, name="conv_init")()
            y = _StemBNPool(use_running_average=not train,
                            dtype=self.dtype, name="bn_init")(
                jnp.asarray(x, jnp.float32), kernel)
        else:
            y = nn.Conv(self.num_filters, (7, 7), (2, 2),
                        padding=((3, 3), (3, 3)), use_bias=False,
                        dtype=self.dtype, name="conv_init")(x)
            y = norm(name="bn_init")(y)
            y = nn.relu(y)
            feats.append(y)  # 1/2
            y = stem_max_pool(y, two_stage=self.pool_two_stage)
        stage_sizes = (self.stage_sizes[: max(depth - 1, 0)]
                       if return_features else self.stage_sizes)
        for i, block_count in enumerate(stage_sizes):
            for j in range(block_count):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                y = self.block_cls(self.num_filters * 2 ** i,
                                   strides=strides, conv=conv, norm=norm,
                                   name=f"layer{i + 1}_{j}")(y)
            feats.append(y)  # 1/4, 1/8, 1/16, 1/32

        if return_features:
            return feats[: depth + 1]

        y = jnp.mean(feats[-1], axis=(1, 2))
        y = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(y)
        return y


def resnet_model(model="resnet18", pretrained=False, in_channels=3,
                 fc_out_features=2, dtype=jnp.float32,
                 weights_dir="weights", stem_pallas=False):
    """Factory mirroring the reference resnet_model (model.py:15-23).

    ``pretrained`` requires converted torchvision weights at
    ``<weights_dir>/<model>.npz`` (tools/convert_torchvision.py writes them
    on a host that has torchvision; this image has neither torchvision nor
    egress). The check happens here so a missing file fails at build time;
    the actual overlay onto initialized variables is
    ``load_pretrained_variables`` (applied in training/train.py after init,
    since flax modules carry no state).
    """
    block_cls, stage_sizes = RESNET_CONFIGS[model.lower()]
    net = ResNet(block_cls=block_cls, stage_sizes=stage_sizes,
                 num_classes=fc_out_features, in_channels=in_channels,
                 dtype=dtype, stem_pallas=stem_pallas)
    if pretrained:
        path = os.path.join(weights_dir, f"{model.lower()}.npz")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"--classifier_pretrained requested but {path} does not "
                "exist. Convert torchvision ImageNet weights with "
                f"`python tools/convert_torchvision.py {model.lower()} "
                f"{path}` on a host that has torchvision, or from a "
                "torchvision-layout checkpoint in-image with "
                "`--state_dict ckpt.pth` (needs only torch)")
    return net


def load_pretrained_npz(path):
    """Load a flat {path: array} npz of converted weights."""
    with np.load(path) as data:
        return {k: jnp.asarray(v) for k, v in data.items()}


# conv_init and fc stay at random init: the reference replaces torchvision's
# conv1 and fc with freshly-initialized layers even when pretrained=True
# (model.py:15-23), so only the backbone carries ImageNet weights.
PRETRAINED_SKIP = ("conv_init", "fc")


def overlay_pretrained(variables, flat, skip=PRETRAINED_SKIP, prefix=(),
                       ignore_missing=False):
    """Overlay a flat ``{collection/module/.../leaf: array}`` dict (the
    layout written by tools/convert_torchvision.py) onto freshly-initialized
    flax variables.

    ``prefix`` descends into a submodule first (e.g. ``("encoder",)`` for
    the U-Net++ encoder, paralleling smp's encoder_weights='imagenet',
    reference train.py:218-225). Strict: unknown paths and shape mismatches
    raise, unless ``ignore_missing`` (truncated-depth encoders, e.g. the
    neural ISP's depth-3 ResNet34, only instantiate the early stages).
    Returns (new_variables, applied_key_list).
    """
    import copy
    new_vars = copy.deepcopy(flax_to_dict(variables))
    applied = []
    for key, arr in flat.items():
        parts = key.split("/")
        coll, path = parts[0], parts[1:]
        if path and path[0] in skip:
            continue
        node = new_vars.get(coll)
        if node is None:
            raise KeyError(f"collection {coll!r} not in variables "
                           f"(have {sorted(new_vars)})")
        missing = False
        for p in prefix + tuple(path[:-1]):
            if p not in node:
                if ignore_missing:
                    missing = True
                    break
                raise KeyError(f"pretrained path {key!r} not found under "
                               f"prefix {prefix}: missing {p!r}")
            node = node[p]
        if missing:
            continue
        leaf = path[-1]
        if leaf not in node:
            if ignore_missing:
                continue
            raise KeyError(f"pretrained leaf {key!r} not in variables")
        if tuple(node[leaf].shape) != tuple(arr.shape):
            raise ValueError(f"shape mismatch for {key}: variables have "
                             f"{node[leaf].shape}, npz has {arr.shape}")
        node[leaf] = jnp.asarray(arr, node[leaf].dtype)
        applied.append(key)
    return new_vars, applied


def flax_to_dict(variables):
    """Plain-dict view of (possibly frozen) flax variables."""
    if hasattr(variables, "unfreeze"):
        return variables.unfreeze()
    return {k: flax_to_dict(v) if isinstance(v, dict) or hasattr(v, "unfreeze")
            else v for k, v in variables.items()}


def load_pretrained_variables(model_name, variables, weights_dir="weights",
                              prefix=(), required=True,
                              ignore_missing=False):
    """Overlay converted ImageNet weights for ``model_name`` onto
    ``variables`` from ``<weights_dir>/<model_name>.npz``.

    required=True raises when the file is absent (the user explicitly asked
    for pretrained init); required=False returns variables unchanged with a
    note (segmentation's encoder_weights='imagenet' default, which this
    zero-egress image cannot satisfy out of the box).

    The conv_init/fc skip applies only to the TOP-LEVEL classifier
    (prefix=()): the reference replaces conv1/fc there (model.py:15-23)
    but smp's encoder_weights='imagenet' loads the FULL stem for encoder
    submodules — skipping conv_init for an encoder overlay would leave a
    silently random first conv."""
    path = os.path.join(weights_dir, f"{model_name.lower()}.npz")
    if not os.path.exists(path):
        if required:
            raise FileNotFoundError(
                f"pretrained weights requested but {path} does not exist; "
                "run tools/convert_torchvision.py on a host with "
                "torchvision, or in-image via its --state_dict mode")
        print(f"note: no converted ImageNet weights at {path}; "
              "encoder uses random init")
        return variables, []
    flat = load_pretrained_npz(path)
    skip = PRETRAINED_SKIP if not prefix else ("fc",)
    return overlay_pretrained(variables, flat, skip=skip, prefix=prefix,
                              ignore_missing=ignore_missing)
