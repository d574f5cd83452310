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


def test_pallas_backward_kernel_compiled_on_tpu(raw_batch):
    """Compiled-mode (non-interpret) parity of the hand-written backward
    kernel on real TPU hardware. Skipped on the CPU mesh — run it with a
    TPU attached (it is the VERDICT-r1 'land the kernel on hardware'
    artifact; see also ROUND2_NOTES.md for measured timings).

    Two-part contract:
      1. compiled == interpret (tight): the Mosaic lowering computes the
         SAME algorithm in the same order, so agreement must be near-exact
         — this is the 'does the hardware kernel work' invariant.
      2. vs jitted autodiff: on a SMOOTH input. The reference clips to
         [1e-5, 1] and the gamma gradient is out/(gamma*v), so pixels
         with v near the 1e-5 floor amplify forward-rounding noise by
         1/v (~1e5): any two correct autodiffs of epsilon-different
         forwards disagree wildly there, and a noise input + sharpening
         drives ~30% of pixels to the floor. A smoothed input keeps every
         pixel off the floor (verified: 0% below 0.02 out-value), leaving
         only benign ceiling clips — so tight statistical agreement is
         meaningful."""
    import pytest
    if jax.devices()[0].platform != "tpu":
        pytest.skip("needs a real TPU (compiled Mosaic path)")
    from scipy.ndimage import uniform_filter
    from raw2logit_tpu.pallas.fused_isp_bwd import fused_isp_bwd_pallas

    smooth = np.stack([uniform_filter(b, 7, mode="reflect")
                       for b in np.asarray(raw_batch[:2], np.float64)])
    smooth = 0.25 + 0.5 * (smooth - smooth.min()) / (np.ptp(smooth) + 1e-9)
    raw = jnp.asarray(smooth, jnp.float32)
    _, variables = _params(raw)
    params = variables["params"]

    @jax.jit  # ONE program — eager dispatch would remote-compile per op
    def reference(raw, params):
        out, vjp = jax.vjp(fused_isp_reference, raw, params)
        return vjp(out * 0.5 + 0.1), out * 0.5 + 0.1

    (draw_ref, dparams_ref), g = reference(raw, params)
    compiled = jax.jit(
        lambda r, p, c: fused_isp_bwd_pallas(r, p, c, interpret=False))
    interp = jax.jit(
        lambda r, p, c: fused_isp_bwd_pallas(r, p, c, interpret=True))
    draw, dparams = compiled(raw, params, g)
    draw_i, dparams_i = interp(raw, params, g)

    # 1. Mosaic vs interpreter: near-exact
    np.testing.assert_allclose(np.asarray(draw), np.asarray(draw_i),
                               rtol=1e-4, atol=1e-3)
    for k in dparams_i:
        np.testing.assert_allclose(np.asarray(dparams[k]),
                                   np.asarray(dparams_i[k]),
                                   rtol=1e-3, atol=1e-3, err_msg=k)

    # 2. vs autodiff on the smooth input: tight everywhere except a
    # vanishing fraction of ceiling-straddle pixels (order-1 flips)
    scale = float(jnp.abs(draw_ref).max())
    err = np.abs(np.asarray(draw) - np.asarray(draw_ref))
    assert (err > 1e-2 * scale).mean() < 2e-2
    assert np.median(err) < 1e-3 * scale
    for k in dparams_ref:
        a, b = np.asarray(dparams[k]), np.asarray(dparams_ref[k])
        assert np.abs(a - b).max() / max(np.abs(b).max(), 1e-3) < 2e-2, k


def test_backward_kernel_residual_variant_matches(raw_batch):
    """The residual-consuming bwd kernel (fed by the training forward's
    saved deb/s/t planes) must equal the recompute variant exactly —
    same algorithm, same order, just without the recompute."""
    from raw2logit_tpu.pallas.fused_isp import (_fused_fwd_planar_train,
                                                _pack_params)
    from raw2logit_tpu.pallas.fused_isp_bwd import fused_isp_bwd_pallas
    raw = jnp.asarray(raw_batch[:2])
    _, variables = _params(raw)
    params = variables["params"]

    out_planar, res = _fused_fwd_planar_train(raw, _pack_params(params),
                                              interpret=True)
    g = jnp.transpose(out_planar, (0, 2, 3, 1)) * 0.5 + 0.1

    draw_a, dp_a = fused_isp_bwd_pallas(raw, params, g, interpret=True)
    draw_b, dp_b = fused_isp_bwd_pallas(raw, params, g, interpret=True,
                                        res=res)
    np.testing.assert_allclose(np.asarray(draw_a), np.asarray(draw_b),
                               rtol=1e-6, atol=1e-6)
    for k in dp_a:
        np.testing.assert_allclose(np.asarray(dp_a[k]), np.asarray(dp_b[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_custom_vjp_pallas_choice_uses_residual_forward(raw_batch,
                                                       monkeypatch):
    """With R2L_FUSED_BWD=pallas the custom VJP runs the residual-saving
    training forward + residual bwd kernel; grads must still match the
    jnp truth source (interpret mode)."""
    monkeypatch.setenv("R2L_FUSED_BWD", "pallas")
    raw = jnp.asarray(raw_batch[:2])
    _, variables = _params(raw)
    params = variables["params"]

    def loss_fused(raw, params):
        return jnp.sum(fused_isp(raw, params) ** 2)

    def loss_ref(raw, params):
        return jnp.sum(fused_isp_reference(raw, params) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(raw, params)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(raw, params)
    np.testing.assert_allclose(np.asarray(g_fused[0]), np.asarray(g_ref[0]),
                               rtol=1e-3, atol=1e-3)
    for k in g_ref[1]:
        np.testing.assert_allclose(np.asarray(g_fused[1][k]),
                                   np.asarray(g_ref[1][k]),
                                   rtol=2e-3, atol=2e-3, err_msg=k)


def test_ssim_aux_kernel_matches_autodiff():
    """The fused SSIM-aux kernel (pallas/ssim_aux.py) must match
    jax.value_and_grad of weight * ops.ssim on the transposed planar
    inputs — value and d/d(adv_rgb) both (interpret mode)."""
    from raw2logit_tpu.ops.ssim import ssim
    from raw2logit_tpu.pallas.ssim_aux import ssim_aux_value_grad

    rng = np.random.default_rng(7)
    ref = jnp.asarray(rng.uniform(size=(2, 3, 32, 32)), jnp.float32)
    x = jnp.asarray(rng.uniform(size=(2, 3, 32, 32)), jnp.float32)
    for weight in (0.3, 1.0):
        v_k, g_k = ssim_aux_value_grad(ref, x, weight, interpret=True)

        def f(xx):
            return weight * ssim(jnp.transpose(ref, (0, 2, 3, 1)),
                                 jnp.transpose(xx, (0, 2, 3, 1)))

        v_t, g_t = jax.value_and_grad(f)(x)
        np.testing.assert_allclose(float(v_k), float(v_t), atol=1e-6)
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_t),
                                   atol=1e-8)


def test_staged_adv_aux_kernel_matches_xla_aux(monkeypatch):
    """The staged adversarial step with the fused SSIM-aux kernel (fast
    Pallas path) must produce the same loss/aux/update direction as the
    XLA aux route (processor without use_pallas), one step from the same
    state."""
    from raw2logit_tpu.training import (TrainConfig, create_train_state,
                                        make_staged_train_step)
    from raw2logit_tpu.models import resnet_model

    monkeypatch.setenv("R2L_FUSED_BWD", "pallas")
    rng = np.random.default_rng(11)
    raw = jnp.asarray(rng.uniform(size=(2, 32, 32)), jnp.float32)
    y = jnp.asarray([0, 1], jnp.int32)
    cfg = TrainConfig(task="classification", lr=1e-2, adv_training=True,
                      loss_weight=-1.0, adv_aux_loss="ssim",
                      adv_aux_weight=0.5, freeze_classifier=True)
    classifier = resnet_model("resnet18", fc_out_features=2)

    outs = {}
    for tag, use_pallas in (("kernel", True), ("xla", False)):
        proc = ParametrizedProcessing(camera_parameters=None, image_size=32,
                                      use_pallas=use_pallas)
        state, tx = create_train_state(cfg, proc, classifier, raw,
                                       jax.random.key(0))
        step = make_staged_train_step(cfg, proc, classifier, tx,
                                      donate=False)
        assert ("aux_grad" in step.programs)
        s2, mets = step(state, raw, y, jax.random.key(1))
        outs[tag] = (mets, s2.proc_params["gamma_correct"])

    m_k, m_x = outs["kernel"][0], outs["xla"][0]
    np.testing.assert_allclose(float(m_k["loss_aux"]),
                               float(m_x["loss_aux"]), atol=1e-5)
    np.testing.assert_allclose(float(m_k["loss"]), float(m_x["loss"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs["kernel"][1]),
                               np.asarray(outs["xla"][1]), atol=1e-5)
