"""Custom gather-based maxpool backward (models/resnet.py
max_pool_3x3_s2): forward parity with nn.max_pool, gradient parity with
XLA's select-and-scatter autodiff on tie-free inputs, and torch's
first-max routing on exact ties."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from raw2logit_tpu.models.resnet import max_pool_3x3_s2


def _ref(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def test_forward_matches_reduce_window():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, 32, 32, 8)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(max_pool_3x3_s2(x)),
                                  np.asarray(_ref(x)))


def test_backward_matches_select_and_scatter():
    """f32 noise has no in-window ties, so the routing must agree with
    XLA's autodiff exactly."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(2, 32, 32, 8)), jnp.float32)
    dy = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
    g_ref = jax.vjp(_ref, x)[1](dy)[0]
    g_new = jax.vjp(max_pool_3x3_s2, x)[1](dy)[0]
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=1e-6)


def test_tie_routes_to_first_tap():
    """Constant window: the whole cotangent goes to the first (row-major)
    tap — torch's MaxPool2d tie rule — not split across ties."""
    x = jnp.ones((1, 8, 8, 1), jnp.float32)
    dy = jnp.ones((1, 4, 4, 1), jnp.float32)
    g = np.asarray(jax.vjp(max_pool_3x3_s2, x)[1](dy)[0])[0, :, :, 0]
    # total mass preserved
    assert g.sum() == 16.0
    # interior window (u,v)=(1..) covers rows 2u-1..2u+1: first tap is
    # (2u-1, 2v-1) — odd coordinates collect the interior windows' mass
    assert g[1, 1] == 1.0
    # positions that are no window's first-max get exactly zero
    assert g[2, 2] == 0.0


def test_grad_through_model_stem_finite():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(size=(2, 16, 16, 4)), jnp.bfloat16)
    g = jax.grad(lambda x: jnp.sum(
        max_pool_3x3_s2(x).astype(jnp.float32) ** 2))(x)
    assert np.isfinite(np.asarray(g, np.float32)).all()
