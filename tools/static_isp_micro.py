#!/usr/bin/env python
"""Measure the static-ISP drift-synthesis generation workload on the chip.

The reference's other hot loop (SURVEY §3.1 HOT LOOP 1): the per-image
numpy ISP running inside DataLoader workers, which generates every
pipeline-processed dataset variant (12 static pipelines; README.md:38-45:
11,280 microscopy + 6,576 drone variants were produced this way). Here the
static ISP is batched jnp on device (isp/static.py), so the all-variants
generation is ONE jitted program: raw batch -> all 12 pipeline outputs.

Measures:
  * sweep12: one program applying the full 12-pipeline grid (the actual
    generation workload; one compile + one server-side program load),
  * the lightest (bilinear/sharpening_filter/gaussian) and heaviest
    (menon2007/unsharp/median) single pipelines,
vs the per-image scipy/numpy truth source (tests/golden_numpy.py) that
matches the reference's execution model, if its timing file exists
(produce with: env -u ... JAX_PLATFORMS=cpu python tools/static_isp_micro.py numpy).

Usage: python tools/static_isp_micro.py [batch] [steps]   (TPU)
       ...                              numpy             (CPU baseline)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BASE_PATH = "results/numpy_static_baseline.json"
OUT_PATH = "results/static_isp_tpu.json"


def measure_numpy_baseline():
    """Per-image scipy/numpy static pipeline (the reference's DataLoader
    hot loop), averaged over the 12-pipeline grid, 2 images each."""
    import numpy as np
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    import golden_numpy as G
    from raw2logit_tpu.data.datasets import MICROSCOPY_CAMERA_PARAMS
    from raw2logit_tpu.evaluation.abtesting import pipeline_grid

    bl, wb, ccm = MICROSCOPY_CAMERA_PARAMS
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(256, 256)).astype(np.float32)
    per_pipeline = {}
    for db, sh, dn in pipeline_grid():
        G.static_pipeline(img, bl, wb, ccm, db, sh, dn)  # warm
        t0 = time.perf_counter()
        n = 2
        for _ in range(n):
            G.static_pipeline(img, bl, wb, ccm, db, sh, dn)
        per_pipeline[f"{db}_{sh}_{dn}"] = (time.perf_counter() - t0) / n
    total = sum(per_pipeline.values())
    out = {"per_pipeline_sec_per_img": {k: round(v, 4)
                                        for k, v in per_pipeline.items()},
           "sweep12_imgs_per_sec": round(1.0 / total, 4),
           "note": "per-image scipy/numpy (reference DataLoader-worker "
                   "execution model), 1 CPU core"}
    os.makedirs("results", exist_ok=True)
    with open(BASE_PATH, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


def main():
    from raw2logit_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from raw2logit_tpu.data.datasets import MICROSCOPY_CAMERA_PARAMS
    from raw2logit_tpu.evaluation.abtesting import pipeline_grid
    from raw2logit_tpu.isp.static import StaticPipeline

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    size = 256

    grid = pipeline_grid()
    pipes = {f"{db}_{sh}_{dn}": StaticPipeline(
        camera_parameters=MICROSCOPY_CAMERA_PARAMS,
        debayer=db, sharpening=sh, denoising=dn)
        for db, sh, dn in grid}

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.uniform(size=(batch, size, size)), jnp.float32)

    # Program OUTPUTS are planar (..., 3, H, W): a channel-LAST output
    # forces the backend's T(8,128) tiled output copy to pad the 3-wide
    # lane dimension to 128 — a 42x HBM blowup (measured: the stacked
    # (12,B,H,W,3) f32 output tried to allocate 103 GB).
    @jax.jit
    def sweep12(raw):
        # the drift-synthesis generation step: every pipeline variant of
        # the batch in one program (stacked to one device array)
        return jnp.stack(
            [jnp.transpose(p(raw), (0, 3, 1, 2)) for p in pipes.values()])

    def time_fn(fn, *args):
        out = fn(*args)
        for _ in range(2):
            out = fn(*args)
        assert np.isfinite(float(jnp.ravel(out)[0]))  # true D2H barrier
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        assert np.isfinite(float(jnp.ravel(out)[0]))
        return (time.perf_counter() - t0) / steps

    result = {"batch": batch, "size": size}
    dt = time_fn(sweep12, raw)
    result["sweep12_step_ms"] = round(dt * 1e3, 3)
    result["sweep12_imgs_per_sec"] = round(batch / dt, 2)
    result["sweep12_variants_per_sec"] = round(12 * batch / dt, 2)

    for tag, name in (("lightest",
                       "bilinear_sharpening_filter_gaussian_denoising"),
                      ("heaviest",
                       "menon2007_unsharp_masking_median_denoising")):
        pipe = pipes[name]
        fn = jax.jit(lambda r, p=pipe: jnp.transpose(p(r), (0, 3, 1, 2)))
        dt = time_fn(fn, raw)
        result[f"{tag}_pipeline"] = name
        result[f"{tag}_step_ms"] = round(dt * 1e3, 3)
        result[f"{tag}_imgs_per_sec"] = round(batch / dt, 2)

    if os.path.exists(BASE_PATH):
        with open(BASE_PATH) as fh:
            base = json.load(fh)
        result["sweep12_vs_numpy_cpu"] = round(
            result["sweep12_imgs_per_sec"] / base["sweep12_imgs_per_sec"], 2)

    print(json.dumps(result))
    os.makedirs("results", exist_ok=True)
    with open(OUT_PATH, "w") as fh:
        json.dump(result, fh, indent=2)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "numpy":
        measure_numpy_baseline()
    else:
        main()
