"""BatchNorm with exact torch semantics (nn.BatchNorm2d(affine=False)).

Differences vs flax.linen.BatchNorm that matter for parity with the
reference's processor output BN (pipeline_torch.py:168,216-217):
  * running_var is updated with the UNBIASED batch variance while
    normalization uses the BIASED one (torch behaviour);
  * torch momentum 0.1 means ``r = 0.9 * r + 0.1 * batch_stat``.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class TorchBatchNorm(nn.Module):
    """Channel-last batch norm over (B, ..., C), affine-free by default."""

    momentum: float = 0.1
    epsilon: float = 1e-5
    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x, use_running_average=None):
        if use_running_average is not None:
            use_ra = use_running_average
        else:
            use_ra = bool(self.use_running_average)
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            n = 1
            for a in axes:
                n *= x.shape[a]
            mean = jnp.mean(x, axis=axes)
            var = jnp.mean((x - mean) ** 2, axis=axes)  # biased, used for norm
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


def _bcast(v, ndim, axis):
    """Reshape per-channel (C,) stats for broadcast against an
    arbitrary channel axis."""
    shape = [1] * ndim
    shape[axis] = -1
    return jnp.reshape(v, shape)


def bn_input_cotangent(x, dy, stats, training, epsilon=1e-5, axis=-1):
    """Closed-form input-cotangent of affine-free TorchBatchNorm.

    jax.vjp through the module re-runs the whole forward and transposes it;
    this is the textbook two-pass formula (one reduction pass, one
    elementwise pass that fuses into downstream consumers). training=True
    uses batch statistics (biased variance, like the forward's
    normalization); training=False is the elementwise-affine eval mode
    using ``stats`` = {"mean", "var"} running values. ``axis`` is the
    channel axis (the fast staged path runs BN on the fused kernel's
    planar (B, C, H, W) layout, axis=1). Matches jax.vjp to float
    roundoff (tests/test_isp.py::test_bn_input_cotangent_matches_vjp).
    """
    axis = axis % x.ndim
    if training:
        axes = tuple(a for a in range(x.ndim) if a != axis)
        mu = _bcast(jnp.mean(x, axis=axes), x.ndim, axis)
        var = _bcast(jnp.mean((x - mu) ** 2, axis=axes), x.ndim, axis)
        r = jax.lax.rsqrt(var + epsilon)
        xhat = (x - mu) * r
        m1 = _bcast(jnp.mean(dy, axis=axes), x.ndim, axis)
        m2 = _bcast(jnp.mean(dy * xhat, axis=axes), x.ndim, axis)
        return r * (dy - m1 - xhat * m2)
    return dy * _bcast(jax.lax.rsqrt(stats["var"] + epsilon), x.ndim, axis)


def torch_bn_forward(x, stats, training, momentum=0.1, epsilon=1e-5,
                     axis=-1):
    """Functional affine-free TorchBatchNorm with an arbitrary channel
    axis: returns (y, new_stats). Same arithmetic as the module
    (normalize with the BIASED batch variance, update running_var with
    the UNBIASED one, torch momentum convention); the fast staged path
    uses it on planar (B, C, H, W) tensors where the flax module's
    channel-last contract would force a layout change."""
    axis = axis % x.ndim
    if not training:
        mean = _bcast(stats["mean"], x.ndim, axis)
        var = _bcast(stats["var"], x.ndim, axis)
        return (x - mean) * jax.lax.rsqrt(var + epsilon), stats
    axes = tuple(a for a in range(x.ndim) if a != axis)
    n = 1
    for a in axes:
        n *= x.shape[a]
    mean = jnp.mean(x, axis=axes)
    mu = _bcast(mean, x.ndim, axis)
    var = jnp.mean((x - mu) ** 2, axis=axes)
    unbiased = var * (n / max(n - 1, 1))
    new_stats = dict(
        stats,
        mean=(1 - momentum) * stats["mean"] + momentum * mean,
        var=(1 - momentum) * stats["var"] + momentum * unbiased)
    y = (x - mu) * jax.lax.rsqrt(_bcast(var, x.ndim, axis) + epsilon)
    return y, new_stats
