"""Fused Pallas stem (conv7x7/2 + BN + relu + maxpool3x3/2) vs the plain
jnp/flax stem — forward, batch stats, and every gradient, in interpret
mode (the real-chip timing lives in tools/stem_micro.py)."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from raw2logit_tpu.pallas.stem import (stem_eval, stem_reference,
                                       stem_train)

B, H, W = 2, 32, 32


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(scale=0.1, size=(7, 7, 3, 64)), jnp.float32)
    gamma = jnp.asarray(1.0 + 0.1 * rng.normal(size=(64,)), jnp.float32)
    beta = jnp.asarray(0.1 * rng.normal(size=(64,)), jnp.float32)
    mean = jnp.asarray(0.05 * rng.normal(size=(64,)), jnp.float32)
    var = jnp.asarray(1.0 + 0.2 * rng.uniform(size=(64,)), jnp.float32)
    return x, w, gamma, beta, mean, var


def test_stem_train_forward_matches_reference_f32():
    x, w, gamma, beta, mean, var = _inputs()
    pooled, bm, bv = stem_train(x, w, gamma, beta, 1e-5, jnp.float32,
                                True)
    ref, _, _ = stem_reference(x, w, gamma, beta, mean, var, train=True)
    assert pooled.shape == (B, H // 4, W // 4, 64)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # batch stats (biased var, like flax BatchNorm)
    y = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(bm),
                               np.mean(np.asarray(y), axis=(0, 1, 2)),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(bv),
                               np.var(np.asarray(y), axis=(0, 1, 2)),
                               atol=2e-5, rtol=2e-4)


def test_stem_eval_matches_reference_f32():
    x, w, gamma, beta, mean, var = _inputs(1)
    pooled = stem_eval(x, w, gamma, beta, mean, var, 1e-5, jnp.float32,
                       True)
    ref, _, _ = stem_reference(x, w, gamma, beta, mean, var, train=False)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_stem_train_gradients_match_reference_f32():
    x, w, gamma, beta, mean, var = _inputs(2)
    # a fixed random cotangent projection makes the scalar loss exercise
    # every output element
    rng = np.random.default_rng(7)
    ct = jnp.asarray(rng.normal(size=(B, H // 4, W // 4, 64)), jnp.float32)

    def loss_kernel(x, w, gamma, beta):
        pooled, _, _ = stem_train(x, w, gamma, beta, 1e-5, jnp.float32,
                                  True)
        return jnp.sum(pooled * ct)

    def loss_ref(x, w, gamma, beta):
        pooled, _, _ = stem_reference(x, w, gamma, beta, mean, var,
                                      train=True)
        return jnp.sum(pooled * ct)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(x, w, gamma, beta)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, gamma, beta)
    for a, b, name, tol in zip(gk, gr, ("d_x", "d_w", "d_gamma", "d_beta"),
                               (2e-4, 2e-4, 2e-4, 2e-4)):
        scale = np.maximum(np.abs(np.asarray(b)).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   atol=tol, err_msg=name)


def test_stem_train_bf16_close_to_f32_reference():
    x, w, gamma, beta, mean, var = _inputs(3)
    pooled, _, _ = stem_train(x, w, gamma, beta, 1e-5, jnp.bfloat16, True)
    ref, _, _ = stem_reference(x, w, gamma, beta, mean, var, train=True)
    err = np.abs(np.asarray(pooled, np.float32) - np.asarray(ref))
    spread = np.asarray(ref).max() - np.asarray(ref).min()
    assert np.median(err) / spread < 0.01
    assert err.max() / spread < 0.08


def test_stem_rejects_nothing_but_shapes_are_contracted():
    # H, W must be multiples of 4 (s2d + even pooling); 32 is the
    # smallest tested contract, 256 the production one
    x, w, gamma, beta, mean, var = _inputs(4)
    pooled = stem_eval(x, w, gamma, beta, mean, var, 1e-5, jnp.float32,
                       True)
    assert pooled.shape == (B, 8, 8, 64)


def test_resnet_stem_pallas_checkpoint_compatible_and_close():
    """ResNet(stem_pallas=True) has the IDENTICAL parameter/batch-stats
    tree as the flax stem and computes the same logits / BN running-stat
    updates on shared weights."""
    from raw2logit_tpu.models import resnet_model

    net_a = resnet_model("resnet18", fc_out_features=2, dtype=jnp.float32)
    net_b = resnet_model("resnet18", fc_out_features=2, dtype=jnp.float32,
                         stem_pallas=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    va = net_a.init(jax.random.key(0), x, train=False)
    vb = net_b.init(jax.random.key(0), x, train=False)
    ta = jax.tree_util.tree_structure(va)
    tb = jax.tree_util.tree_structure(vb)
    assert ta == tb
    sa = jax.tree_util.tree_map(lambda l: l.shape, va)
    sb = jax.tree_util.tree_map(lambda l: l.shape, vb)
    assert sa == sb

    # same weights through both stems: eval logits match
    la = net_a.apply(va, x, train=False)
    lb = net_b.apply(va, x, train=False)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               atol=5e-4, rtol=5e-4)

    # train mode: logits + mutated running stats match
    la, ma = net_a.apply(va, x, train=True, mutable=["batch_stats"])
    lb, mb = net_b.apply(va, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               atol=5e-4, rtol=5e-4)
    for key in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(ma["batch_stats"]["bn_init"][key]),
            np.asarray(mb["batch_stats"]["bn_init"][key]),
            atol=1e-5, rtol=1e-4)

    # gradients flow through the fused stem inside the full model
    def loss(params, net, stats):
        lg, _ = net.apply({"params": params, "batch_stats": stats}, x,
                          train=True, mutable=["batch_stats"])
        return jnp.sum(lg ** 2)

    ga = jax.grad(loss)(va["params"], net_a, va["batch_stats"])
    gb = jax.grad(loss)(va["params"], net_b, va["batch_stats"])
    for name in ("conv_init", "bn_init"):
        fa = jax.flatten_util.ravel_pytree(ga[name])[0]
        fb = jax.flatten_util.ravel_pytree(gb[name])[0]
        scale = float(jnp.max(jnp.abs(fa))) + 1e-8
        np.testing.assert_allclose(np.asarray(fb) / scale,
                                   np.asarray(fa) / scale, atol=2e-3,
                                   err_msg=name)
