#!/usr/bin/env python
"""Per-stage ISP fidelity report.

Produces the parity evidence the BASELINE demands (per-stage SSIM >= 0.999):
for a batch of synthetic raw mosaics, compare
  (a) each static-pipeline stage (jnp) vs the independent scipy golden
      implementation (tests/golden_numpy.py), and
  (b) the fused Pallas kernel vs the staged jnp parametrized pipeline.

Writes results/parity_report.json and prints a table.

Run CPU-only:
  env -u PALLAS_AXON_POOL_IPS -u PYTHONPATH JAX_PLATFORMS=cpu \
      python tools/parity_report.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import golden_numpy as gold
    from raw2logit_tpu.isp import ParametrizedProcessing
    from raw2logit_tpu.isp.static import static_process
    from raw2logit_tpu.ops import ssim as jssim
    from raw2logit_tpu.ops import (adjust_gamma, colour_correction,
                                   demosaic_bilinear_cfa, demosaic_malvar2004,
                                   demosaic_menon2007, gaussian_blur_y,
                                   median_filter_y, sharpen_y,
                                   subtract_black_level_cfa, unsharp_mask_y,
                                   white_balance)
    from raw2logit_tpu.pallas import fused_isp

    cam = ([0.0625, 0.0626, 0.0625, 0.0626],
           [2.86653646, 1.0, 1.73079425],
           [1.50768983, -0.33571374, -0.17197604, -0.23048614, 1.70698738,
            -0.47650126, -0.03119153, -0.32803956, 1.35923111])

    rng = np.random.default_rng(0)
    raw = rng.uniform(0.07, 0.93, size=(4, 128, 128)).astype(np.float32)

    def _ssim01(a, b):
        """SSIM on [0,1]-normalized pair (shared range)."""
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        lo = min(a.min(), b.min())
        hi = max(a.max(), b.max())
        rngv = hi - lo if hi > lo else 1.0
        def _to_nhwc(x):
            if x.ndim == 2:
                return x[None, ..., None]
            if x.ndim == 3:
                return x[None] if x.shape[-1] in (1, 3) else x[..., None]
            return x

        an = _to_nhwc((a - lo) / rngv)
        bn = _to_nhwc((b - lo) / rngv)
        return float(jssim(jnp.asarray(an, jnp.float32),
                           jnp.asarray(bn, jnp.float32)))

    report = {}

    # --- (a) static stages vs scipy golden, per stage ---------------------
    for name, jfn, gfn in [
        ("black_level", lambda x: subtract_black_level_cfa(x, cam[0]),
         lambda x: gold.remove_blacklv(x, cam[0])),
        ("demosaic_bilinear", demosaic_bilinear_cfa, gold.demosaic_bilinear),
        ("demosaic_malvar2004", demosaic_malvar2004, gold.demosaic_malvar2004),
        ("demosaic_menon2007", demosaic_menon2007, gold.demosaic_menon2007),
    ]:
        got = np.asarray(jfn(jnp.asarray(raw[0])))
        want = gfn(raw[0].astype(np.float64))
        report[name] = {"ssim": _ssim01(got, want),
                        "max_abs": float(np.abs(got - want).max())}

    rgb_g = gold.demosaic_bilinear(raw[0].astype(np.float64))
    rgb_j = jnp.asarray(rgb_g, jnp.float32)
    for name, jfn, gfn in [
        ("white_balance", lambda x: white_balance(x, cam[1]),
         lambda x: x * np.asarray(cam[1])),
        ("colour_correction", lambda x: colour_correction(x, cam[2]),
         lambda x: np.einsum("ijk,lk->ijl", x,
                             np.asarray(cam[2]).reshape(3, 3))),
        ("sharpening_filter", sharpen_y, gold.sharpening_filter),
        ("unsharp_masking", unsharp_mask_y, gold.unsharp_masking),
        ("gaussian_denoising", gaussian_blur_y, gold.gaussian_denoising),
        ("median_denoising", median_filter_y, gold.median_denoising),
        ("gamma", lambda x: adjust_gamma(jnp.clip(x, 0, 1)),
         lambda x: np.clip(x, 0, 1) ** (1 / 2.2)),
    ]:
        got = np.asarray(jfn(rgb_j))
        want = gfn(rgb_g.copy())
        report[name] = {"ssim": _ssim01(got, want),
                        "max_abs": float(np.abs(got - want).max())}

    # full static pipeline end-to-end
    for db in ("bilinear", "malvar2004", "menon2007"):
        got = np.asarray(static_process(
            jnp.asarray(raw[0]), *cam, debayer=db,
            sharpening="sharpening_filter", denoising="gaussian_denoising"))
        want = gold.static_pipeline(raw[0], *cam, debayer=db,
                                    sharpening="sharpening_filter",
                                    denoising="gaussian_denoising")
        report[f"static_e2e_{db}"] = {
            "ssim": _ssim01(got, want),
            "max_abs": float(np.abs(got - want).max())}

    # --- (b) differential parity vs the LITERAL reference ------------------
    # fixtures captured from the unmodified /root/reference pipeline_torch
    # (tools/gen_reference_fixtures.py; see tests/test_reference_parity.py
    # for the full contract incl. gradients and the f64 exactness tier)
    import test_reference_parity as refpar
    fx = np.load(refpar.FIXTURE)
    proc_ref = refpar.module_for(refpar.MICROSCOPY_CAM, track_stages=True,
                                 additive=True, image_size=128)
    variables_ref = refpar.build_variables(fx, "A", 128)
    (out_ref, stages_ref), mut_ref = proc_ref.apply(
        variables_ref, jnp.asarray(fx["A.raw"]), train=True,
        mutable=["batch_stats"])
    for name in sorted(stages_ref):
        want = np.transpose(fx[f"A.stage.{name}"], (0, 2, 3, 1))
        got = np.asarray(stages_ref[name])
        report[f"reference_stage_{name}"] = {
            "ssim": _ssim01(got, want),
            "max_abs": float(np.abs(got - want).max())}
    report["reference_out_train"] = {
        "ssim": _ssim01(np.asarray(out_ref),
                        np.transpose(fx["A.out_train"], (0, 2, 3, 1))),
        "max_abs": float(np.abs(
            np.asarray(out_ref)
            - np.transpose(fx["A.out_train"], (0, 2, 3, 1))).max())}

    # --- (c) fused pallas kernel vs staged module --------------------------
    proc = ParametrizedProcessing(camera_parameters=cam,
                                  batch_norm_output=False)
    variables = proc.init(jax.random.key(0), jnp.asarray(raw))
    staged, _ = proc.apply(variables, jnp.asarray(raw), train=False)
    fused = fused_isp(jnp.asarray(raw), variables["params"])
    report["pallas_vs_staged"] = {
        "ssim": _ssim01(np.asarray(fused), np.asarray(staged)),
        "max_abs": float(np.abs(np.asarray(fused) - np.asarray(staged)).max())}

    os.makedirs("results", exist_ok=True)
    with open("results/parity_report.json", "w") as fh:
        json.dump(report, fh, indent=2)

    width = max(len(k) for k in report)
    print(f"{'stage':<{width}}  {'SSIM':>8}  {'max|diff|':>10}")
    ok = True
    for k, v in report.items():
        flag = "" if v["ssim"] >= 0.999 else "  << BELOW 0.999"
        if v["ssim"] < 0.999:
            ok = False
        print(f"{k:<{width}}  {v['ssim']:>8.5f}  {v['max_abs']:>10.2e}{flag}")
    print("PARITY:", "OK (all stages SSIM >= 0.999)" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
