"""Processor-level tests: static pipeline golden parity, parametrized vs
static cross-validation (the reference's own parity contract,
pipeline_torch.py:287-347), stage tracking, taps, batch-norm semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import golden_numpy as gold
from raw2logit_tpu.isp import ParametrizedProcessing, RawToRGB, StaticPipeline
from raw2logit_tpu.isp.static import static_process
from raw2logit_tpu.ops.ssim import ssim

CAM = (
    [0.0625, 0.0626, 0.0625, 0.0626],
    [2.86653646, 1.0, 1.73079425],
    [1.50768983, -0.33571374, -0.17197604, -0.23048614,
     1.70698738, -0.47650126, -0.03119153, -0.32803956, 1.35923111],
)


@pytest.mark.parametrize("debayer", ["bilinear", "malvar2004", "menon2007"])
@pytest.mark.parametrize("sharpening,denoising", [
    ("sharpening_filter", "gaussian_denoising"),
    ("unsharp_masking", "median_denoising"),
    ("sharpening_filter", "fft_denoising"),
])
def test_static_pipeline_golden(raw_image, debayer, sharpening, denoising):
    pipe = StaticPipeline(camera_parameters=CAM, debayer=debayer,
                          sharpening=sharpening, denoising=denoising)
    got = np.asarray(pipe(jnp.asarray(raw_image)))
    want = gold.static_pipeline(raw_image, *CAM, debayer=debayer,
                                sharpening=sharpening, denoising=denoising)
    assert got.shape == want.shape == raw_image.shape + (3,)
    # atol: float32 vs float64 rounding across the clip(0,1) threshold gets
    # amplified by gamma's unbounded slope at 0 for isolated pixels.
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_static_pipeline_batched(raw_batch):
    pipe = StaticPipeline(camera_parameters=CAM)
    out = np.asarray(pipe(jnp.asarray(raw_batch)))
    per_img = np.stack([np.asarray(pipe(jnp.asarray(r))) for r in raw_batch])
    np.testing.assert_allclose(out, per_img, atol=1e-6)


def test_parametrized_matches_static(raw_batch):
    """The reference's own cross-validation: ParametrizedProcessing vs the
    static pipeline with (bilinear, sharpening_filter, gaussian_denoising)
    (pipeline_torch.py:287-347). Differences are limited to border padding
    modes and the clip floor; demand SSIM >= 0.999."""
    proc = ParametrizedProcessing(camera_parameters=CAM,
                                  batch_norm_output=False)
    variables = proc.init(jax.random.key(0), jnp.asarray(raw_batch))
    rgb, _ = proc.apply(variables, jnp.asarray(raw_batch))

    static = static_process(jnp.asarray(raw_batch), *CAM,
                            debayer="bilinear",
                            sharpening="sharpening_filter",
                            denoising="gaussian_denoising")
    # The two paths differ at borders by construction (torch-'reflect' conv
    # debayer vs scipy-symmetric CFA demosaic — the reference has the same
    # mismatch, see the padding note at pipeline_torch.py:233) and by the
    # clip floor (parametrized clips to 1e-5, static to 0, so dead pixels
    # read 1e-5**(1/2.2) ~= 0.0053 vs 0). Compare the interior.
    inner = (slice(None), slice(8, -8), slice(8, -8))
    s = float(ssim(rgb[inner], static[inner]))
    assert s >= 0.999, f"parametrized vs static interior SSIM {s}"
    diff = np.abs(np.asarray(rgb)[inner] - np.asarray(static)[inner])
    assert diff.max() <= 1e-5 ** (1 / 2.2) + 1e-4


def test_parametrized_stages_and_shapes(raw_batch):
    proc = ParametrizedProcessing(camera_parameters=CAM, track_stages=True)
    variables = proc.init(jax.random.key(0), jnp.asarray(raw_batch))
    (rgb, stages), mutated = proc.apply(
        variables, jnp.asarray(raw_batch), train=True,
        mutable=["batch_stats"])
    assert rgb.shape == raw_batch.shape + (3,)
    assert list(stages) == ["demosaic", "color_correct", "sharpening",
                            "gaussian", "clipped", "gamma_correct"]
    # batch stats updated
    bs = mutated["batch_stats"]["batch_norm"]
    assert not np.allclose(np.asarray(bs["mean"]), 0.0)

    params = variables["params"]
    assert params["black_level"].shape == (4,)
    assert params["white_balance"].shape == (1, 3)
    assert params["colour_correction"].shape == (3, 3)
    assert params["gamma_correct"].shape == (1,)
    assert params["sharpening_filter"].shape == (3, 3)
    assert params["gaussian_blur"].shape == (5, 5)
    assert params["debayer"].shape == (3, 3, 3, 3)


def test_parametrized_additive_layer(raw_batch):
    proc = ParametrizedProcessing(camera_parameters=CAM, additive_layer=True,
                                  image_size=64)
    variables = proc.init(jax.random.key(0), jnp.asarray(raw_batch))
    assert variables["params"]["additive_layer"].shape == (1, 64, 64, 3)
    (rgb, stages) = proc.apply(variables, jnp.asarray(raw_batch),
                               train=False)[0], None
    rgb, stages = proc.apply(variables, jnp.asarray(raw_batch), train=False)
    assert "noise" in stages


def test_parametrized_grads_flow(raw_batch):
    proc = ParametrizedProcessing(camera_parameters=CAM)
    variables = proc.init(jax.random.key(0), jnp.asarray(raw_batch))

    def loss_fn(params):
        rgb, _ = proc.apply({"params": params,
                             "batch_stats": variables["batch_stats"]},
                            jnp.asarray(raw_batch), train=False)
        return jnp.sum(rgb ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    for name in ["black_level", "white_balance", "colour_correction",
                 "gamma_correct", "sharpening_filter", "gaussian_blur",
                 "debayer"]:
        g = np.asarray(grads[name])
        assert np.all(np.isfinite(g)), name
        assert np.abs(g).max() > 0, f"zero grad for {name}"


def test_taps_give_stage_gradients(raw_batch):
    proc = ParametrizedProcessing(camera_parameters=CAM, track_stages=True)
    variables = proc.init(jax.random.key(0), jnp.asarray(raw_batch))
    x = jnp.asarray(raw_batch)
    _, stages = proc.apply(variables, x, train=False)
    taps = {k: jnp.zeros_like(v) for k, v in stages.items()}

    def loss_fn(taps):
        rgb, _ = proc.apply(variables, x, train=False, taps=taps)
        return jnp.sum(rgb ** 2)

    g = jax.grad(loss_fn)(taps)
    assert set(g) == set(stages)
    # gradient w.r.t. the final stage tap == dL/drgb exactly (2 * rgb)
    rgb, _ = proc.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(g["gamma_correct"]),
                               2 * np.asarray(rgb), rtol=1e-5, atol=1e-6)


def test_raw_to_rgb(raw_batch):
    proc = RawToRGB(reduce_size=True, out_channels=3,
                    normalize_mosaic_mean=[0.5663, 0.1401, 0.0731],
                    normalize_mosaic_std=[0.097, 0.0423, 0.008])
    variables = proc.init(jax.random.key(0), jnp.asarray(raw_batch))
    rgb, stages = proc.apply(variables, jnp.asarray(raw_batch))
    assert rgb.shape == (4, 32, 32, 3)
    assert "demosaic" in stages


def test_batchnorm_torch_semantics(rng):
    from raw2logit_tpu.isp.batchnorm import TorchBatchNorm
    x = jnp.asarray(rng.normal(size=(8, 4, 4, 3)).astype(np.float32)) * 3 + 1
    bn = TorchBatchNorm()
    variables = bn.init(jax.random.key(0), x)
    y, mutated = bn.apply(variables, x, use_running_average=False,
                          mutable=["batch_stats"])
    # normalized output: zero mean, unit (biased) variance
    np.testing.assert_allclose(np.asarray(y).mean(axis=(0, 1, 2)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y).std(axis=(0, 1, 2)), 1, atol=1e-3)
    # running stats: torch momentum 0.1 with unbiased var
    n = 8 * 4 * 4
    batch_mean = np.asarray(x).mean(axis=(0, 1, 2))
    batch_var = np.asarray(x).var(axis=(0, 1, 2)) * n / (n - 1)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["mean"]),
                               0.1 * batch_mean, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["var"]),
                               0.9 * 1.0 + 0.1 * batch_var, rtol=1e-4)


def test_nn_processing_shapes(raw_batch):
    from raw2logit_tpu.isp import NNProcessing
    proc = NNProcessing(normalize_mosaic_mean=[0.5663, 0.1401, 0.0731],
                        normalize_mosaic_std=[0.097, 0.0423, 0.008])
    raw = jnp.asarray(raw_batch)
    variables = proc.init(jax.random.key(0), raw, train=False)
    (rgb, stages), mut = proc.apply(variables, raw, train=True,
                                    mutable=["batch_stats"])
    # half-resolution 3-channel output (reference NNProcessing packs
    # reduce_size=True then runs the U-Net++ at that size)
    assert rgb.shape == (raw.shape[0], raw.shape[1] // 2,
                         raw.shape[2] // 2, 3)
    assert list(stages) == ["demosaic", "rgb"]
    assert np.all(np.isfinite(np.asarray(rgb)))


@pytest.mark.parametrize("training", [True, False])
def test_bn_input_cotangent_matches_vjp(training):
    """Closed-form BN backward (used by the fast staged step) must match
    jax.vjp through TorchBatchNorm to float roundoff."""
    from raw2logit_tpu.isp.batchnorm import TorchBatchNorm, bn_input_cotangent

    k1, k2 = jax.random.split(jax.random.key(3))
    x = jax.random.normal(k1, (8, 16, 16, 3), jnp.float32) * 2.0 + 0.5
    dy = jax.random.normal(k2, x.shape, jnp.float32)
    stats = {"mean": jnp.array([0.1, -0.2, 0.3]),
             "var": jnp.array([1.5, 0.7, 2.2])}
    bn = TorchBatchNorm()

    def through_bn(x):
        if training:
            return bn.apply({"batch_stats": stats}, x,
                            use_running_average=False,
                            mutable=["batch_stats"])[0]
        return bn.apply({"batch_stats": stats}, x,
                        use_running_average=True)

    _, vjp = jax.vjp(through_bn, x)
    want, = vjp(dy)
    got = bn_input_cotangent(x, dy, stats, training=training)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)
