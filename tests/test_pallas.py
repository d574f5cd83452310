"""Fused Pallas ISP kernel: forward parity vs the jnp truth source, and
custom-VJP gradient checks (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from raw2logit_tpu.isp import ParametrizedProcessing
from raw2logit_tpu.pallas import fused_isp, fused_isp_reference

CAM = (
    [0.01, 0.012, 0.011, 0.013],
    [1.5, 1.0, 1.2],
    [1.2, -0.1, -0.05, -0.08, 1.1, -0.02, -0.03, -0.1, 1.15],
)


def _params(raw):
    proc = ParametrizedProcessing(camera_parameters=CAM,
                                  batch_norm_output=False)
    variables = proc.init(jax.random.key(0), raw)
    return proc, variables


def test_fused_matches_reference(raw_batch):
    raw = jnp.asarray(raw_batch)
    proc, variables = _params(raw)
    params = variables["params"]
    got = np.asarray(fused_isp(raw, params))
    want = np.asarray(fused_isp_reference(raw, params))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_matches_staged_module(raw_batch):
    raw = jnp.asarray(raw_batch)
    proc, variables = _params(raw)
    rgb, _ = proc.apply(variables, raw, train=False)
    got = np.asarray(fused_isp(raw, variables["params"]))
    np.testing.assert_allclose(got, np.asarray(rgb), atol=2e-5)


def test_fused_custom_vjp_matches_autodiff(raw_batch):
    raw = jnp.asarray(raw_batch[:2])
    _, variables = _params(raw)
    params = variables["params"]

    def loss_fused(raw, params):
        return jnp.sum(fused_isp(raw, params) ** 2)

    def loss_ref(raw, params):
        return jnp.sum(fused_isp_reference(raw, params) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(raw, params)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(raw, params)
    # atol: pixels sitting exactly on the clip(1e-5, 1) threshold can fall on
    # different sides in the fused (combined WB*CCM*YUV matrix) vs staged
    # forward, flipping the clip subgradient for isolated elements.
    np.testing.assert_allclose(np.asarray(g_fused[0]), np.asarray(g_ref[0]),
                               rtol=1e-3, atol=1e-3)
    for k in g_ref[1]:
        np.testing.assert_allclose(np.asarray(g_fused[1][k]),
                                   np.asarray(g_ref[1][k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)


def test_module_pallas_fast_path_matches_staged(raw_batch):
    raw = jnp.asarray(raw_batch)
    staged = ParametrizedProcessing(camera_parameters=CAM, use_pallas=False)
    fused = ParametrizedProcessing(camera_parameters=CAM, use_pallas=True)
    variables = staged.init(jax.random.key(0), raw)
    out_staged, _ = staged.apply(variables, raw, train=False)
    out_fused, _ = fused.apply(variables, raw, train=False)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_staged),
                               atol=2e-5)


def test_pallas_backward_kernel_matches_autodiff(raw_batch):
    """Hand-written backward kernel vs jax.vjp of the jnp truth source."""
    from raw2logit_tpu.pallas.fused_isp_bwd import fused_isp_bwd_pallas
    raw = jnp.asarray(raw_batch[:2])
    _, variables = _params(raw)
    params = variables["params"]

    out, vjp = jax.vjp(fused_isp_reference, raw, params)
    g = out * 0.5 + 0.1  # arbitrary cotangent
    draw_ref, dparams_ref = vjp(g)

    draw, dparams = fused_isp_bwd_pallas(raw, params, g, interpret=True)
    np.testing.assert_allclose(np.asarray(draw), np.asarray(draw_ref),
                               rtol=1e-3, atol=1e-3)
    for k in dparams_ref:
        np.testing.assert_allclose(
            np.asarray(dparams[k]), np.asarray(dparams_ref[k]),
            rtol=2e-3, atol=2e-3, err_msg=k)
