"""Model-layer unit tests.

stem_max_pool's 2-stage decomposition must be EXACT (same tap set per
output element), so the pool_two_stage flag is a pure performance choice:
same params, bit-identical logits. Reference stem analog:
torchvision's maxpool(3,2,1) used by resnet_model (model.py:15-23).
"""

import jax
import jax.numpy as jnp
import numpy as np

from raw2logit_tpu.models import resnet_model
from raw2logit_tpu.models.resnet import stem_max_pool


def test_stem_pool_two_stage_exact():
    rng = np.random.default_rng(0)
    for shape in ((2, 128, 128, 8), (1, 16, 32, 4), (3, 14, 14, 2)):
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        ref = stem_max_pool(x)
        alt = stem_max_pool(x, two_stage=True)
        assert ref.shape == alt.shape
        assert bool(jnp.all(ref == alt))
    # odd spatial dims fall back to the canonical 3x3 pool (shape safety)
    x = jnp.asarray(rng.standard_normal((1, 17, 33, 4)), jnp.float32)
    assert stem_max_pool(x, two_stage=True).shape == stem_max_pool(x).shape


def test_stem_pool_two_stage_grad_exact():
    # the VJPs route each cotangent to an argmax tap; identical tap sets
    # (and jnp.max's deterministic tie-breaking within a reduction window
    # is irrelevant for distinct random values) give identical gradients
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 4)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((2, 16, 16, 4)), jnp.float32)
    g_ref = jax.grad(lambda x: jnp.vdot(stem_max_pool(x), ct))(x)
    g_alt = jax.grad(
        lambda x: jnp.vdot(stem_max_pool(x, two_stage=True), ct))(x)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_alt))


def test_resnet_pool_flag_same_params_same_logits():
    x = jnp.asarray(
        np.random.default_rng(2).uniform(size=(2, 64, 64, 3)), jnp.float32)
    net_a = resnet_model("resnet18", fc_out_features=5)
    net_b = net_a.clone(pool_two_stage=True)
    variables = net_a.init(jax.random.key(0), x, train=False)
    out_a = net_a.apply(variables, x, train=False)
    out_b = net_b.apply(variables, x, train=False)
    # identical parameter trees (flag adds none) and bit-identical logits
    assert jax.tree_util.tree_structure(
        variables) == jax.tree_util.tree_structure(
        net_b.init(jax.random.key(0), x, train=False))
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
