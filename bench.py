#!/usr/bin/env python
"""Headline benchmark: raw->logit throughput (imgs/sec/chip).

Primary config: parametrized differentiable ISP -> ResNet18 TRAIN step,
256x256 mosaics (the reference's drift-optimization setup, SURVEY.md §6).
vs_baseline is the ratio against a measured PyTorch-CPU implementation of
the same step (benchmarks/torch_baseline.py). Target: >= 10x.

Robustness: this environment's TPU compiles REMOTELY and the full
train-step program has been observed not to finish compiling within an
hour. The measurement therefore runs in a watchdog subprocess; if the train
step does not come up within BENCH_COMPILE_BUDGET seconds, the bench falls
back to the raw->logit INFERENCE step (same ISP + classifier forward, known
to compile), reported against the torch CPU inference baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

from raw2logit_tpu.utils import enable_compilation_cache
enable_compilation_cache()


# All four experiment families (the reference's README.md:33-35 axes:
# drift synthesis = the static grid lives in tools/static_isp_micro.py;
# classification, segmentation, neural-ISP, adversarial live here).
# modes: which measurement children BENCH_MODE=auto may try, in order.
FAMILY_DEFAULTS = {
    "classification": {"batch": 256,
                       "modes": ("train_staged", "train", "infer")},
    "segmentation": {"batch": 64, "modes": ("train_staged", "infer")},
    "neural": {"batch": 64, "modes": ("train_staged", "train", "infer")},
    "adversarial": {"batch": 256, "modes": ("train_staged", "infer")},
}


def _build_family(family, image_size, n_classes, dtype):
    """(processor, classifier, cfg, make_labels, donate) per family.

    Configs mirror the per-family micro tools (tools/{seg,nn_isp,adv}
    _micro.py) so bench.py reuses their cached compiled programs."""
    import jax.numpy as jnp
    import numpy as np
    from raw2logit_tpu.data.datasets import (DRONE_CAMERA_PARAMS,
                                             MICROSCOPY_CAMERA_PARAMS)
    from raw2logit_tpu.isp import NNProcessing, ParametrizedProcessing
    from raw2logit_tpu.models import UNetPlusPlus, resnet_model
    from raw2logit_tpu.training import TrainConfig

    cdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    use_pallas = os.environ.get("BENCH_ISP", "pallas") == "pallas"
    # BENCH_STEM=pallas: fused stem kernels (pallas/stem.py) — the
    # classifier's conv1+BN+relu+maxpool as two hand-written passes
    # instead of XLA's lowering (VERDICT r4 item 4)
    stem_pallas = os.environ.get("BENCH_STEM", "xla") == "pallas"

    if family == "segmentation":
        # reference drone setup: smp.UnetPlusPlus(resnet34, depth 5,
        # decoder (256,128,64,32,16), 1 class) + Dice (train.py:218-237)
        processor = ParametrizedProcessing(
            camera_parameters=DRONE_CAMERA_PARAMS, image_size=image_size,
            use_pallas=use_pallas)
        classifier = UNetPlusPlus(
            encoder_name="resnet34", encoder_depth=5,
            decoder_channels=(256, 128, 64, 32, 16), in_channels=3,
            classes=1, dtype=cdtype)
        cfg = TrainConfig(task="segmentation", lr=1e-5)

        def make_labels(rng, batch):
            return jnp.asarray(
                rng.integers(0, 2, size=(batch, image_size, image_size)),
                jnp.float32)
        return processor, classifier, cfg, make_labels, True

    if family == "neural":
        # reference neural_network mode (train.py:187-200): NNProcessing
        # on the normalized half-res packed mosaic -> resnet18
        processor = NNProcessing(normalize_mosaic_mean=(0.5, 0.5, 0.5),
                                 normalize_mosaic_std=(0.25, 0.25, 0.25))
        classifier = resnet_model("resnet18", fc_out_features=n_classes,
                                  dtype=cdtype)
        cfg = TrainConfig(task="classification", lr=1e-5)
    elif family == "adversarial":
        # drift forensics (train.py:241-273): maximize task loss over ISP
        # params, classifier frozen, SSIM aux vs the frozen default ISP
        processor = ParametrizedProcessing(
            camera_parameters=MICROSCOPY_CAMERA_PARAMS,
            image_size=image_size, use_pallas=use_pallas)
        classifier = resnet_model("resnet18", fc_out_features=n_classes,
                                  dtype=cdtype)
        cfg = TrainConfig(task="classification", lr=1e-3,
                          adv_training=True, loss_weight=-1.0,
                          adv_aux_loss="ssim", adv_aux_weight=0.3,
                          freeze_classifier=True)
    else:  # classification (the headline family)
        processor = ParametrizedProcessing(
            camera_parameters=MICROSCOPY_CAMERA_PARAMS,
            image_size=image_size, use_pallas=use_pallas)
        classifier = resnet_model("resnet18", fc_out_features=n_classes,
                                  dtype=cdtype, stem_pallas=stem_pallas)
        cfg = TrainConfig(task="classification", lr=1e-5)

    def make_labels(rng, batch):
        import jax.numpy as jnp
        return jnp.asarray(rng.integers(0, n_classes, size=(batch,)),
                           jnp.int32)
    # adversarial keeps its state undonated (the frozen reference
    # processor rides in the state across steps; tools/adv_micro.py)
    return processor, classifier, cfg, make_labels, family != "adversarial"


def measure_jax(mode="train", batch=None, image_size=None, steps=None,
                n_classes=9, warmup=3, dtype=None, family=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from raw2logit_tpu.training import (create_train_state,
                                        make_staged_train_step,
                                        make_train_step)

    family = family or os.environ.get("BENCH_FAMILY", "classification")
    # batch 256 saturates the chip for the flagship family (round-2
    # kernels: 2216 imgs/s @64, 3157 @256, 3143 @512; round-3 dieted
    # kernels: 4200 @256, 4218 @512 — the plateau holds at 28.7-28.8%
    # MFU); seg/neural default to the batch their micros measured (64)
    batch = batch or int(os.environ.get(
        "BENCH_BATCH", FAMILY_DEFAULTS[family]["batch"]))
    image_size = image_size or int(os.environ.get("BENCH_SIZE", 256))
    steps = steps or int(os.environ.get("BENCH_STEPS", 20))
    dtype = dtype or os.environ.get("BENCH_DTYPE", "bfloat16")

    processor, classifier, cfg, make_labels, donate = _build_family(
        family, image_size, n_classes, dtype)

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.uniform(size=(batch, image_size, image_size)),
                      jnp.float32)
    y = make_labels(rng, batch)

    # fuse_opt (default on for the flagship family): fold the per-module
    # Adam applies into the two gradient programs (training/core.py) — no
    # standalone opt_apply dispatch and one program fewer to compile
    # cold. Measured 61.09 ms vs 61.27-61.70 unfused at batch 256
    # (within noise — the apply was already hidden by cross-program
    # pipelining), never slower. Seg measured it exactly neutral
    # (SEG_FUSE_OPT); off elsewhere to reuse the micros' cached programs.
    fuse_opt = (mode == "train_staged" and family == "classification"
                and os.environ.get("BENCH_FUSE_OPT", "1") == "1")
    state, tx = create_train_state(cfg, processor, classifier, raw,
                                   jax.random.key(0), split_opt=fuse_opt)

    if mode in ("train", "train_staged"):
        if mode == "train_staged":
            # same mathematical step split into four separately-compiled
            # programs — each fits a remote-compile budget window and is
            # cached independently (training/core.py). opt_apply donates
            # its dead grads/params/opt-state buffers like the monolith.
            step = make_staged_train_step(cfg, processor, classifier, tx,
                                          donate=donate, fuse_opt=fuse_opt)
        else:
            step = make_train_step(cfg, processor, classifier, tx,
                                   donate=donate)
        key = jax.random.key(1)
        for i in range(warmup):
            state, mets = step(state, raw, y, jax.random.fold_in(key, i))
        # VALUE fetch, not block_until_ready: on this plugin backend the
        # ready-event returns early, and the first execution of each
        # program pays a large one-time server-side load (~4 min measured)
        # that would otherwise drain inside the timed loop
        assert np.isfinite(float(mets["loss"]))
        t0 = time.perf_counter()
        for i in range(steps):
            state, mets = step(state, raw, y,
                               jax.random.fold_in(key, 100 + i))
        # fetch the value (D2H) rather than trust block_until_ready alone:
        # on plugin backends an early-returning ready-event would silently
        # inflate throughput; a value fetch cannot complete early
        final_loss = float(mets["loss"])
        assert np.isfinite(final_loss), f"non-finite loss {final_loss}"
    else:  # inference
        pvars = {"params": state.proc_params,
                 "batch_stats": state.proc_stats}
        cvars = {"params": state.clf_params,
                 "batch_stats": state.clf_stats}

        @jax.jit
        def fwd(raw):
            rgb, _ = processor.apply(pvars, raw, train=False)
            return classifier.apply(cvars, rgb, train=False)

        def first(o):  # logits are (B,C); seg masks are (B,H,W,1)
            return float(np.asarray(o).ravel()[0])

        for _ in range(warmup):
            out = fwd(raw)
        assert np.isfinite(first(out))  # true warm barrier (D2H)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fwd(raw)
        assert np.isfinite(first(out)), "non-finite outputs"

    dt = time.perf_counter() - t0

    # step-time / MFU note (VERDICT r1 item 2): XLA's own cost analysis of
    # the already-cached compiled program; never fails the measurement.
    try:
        flops = None
        if mode == "train":
            ex = step.lower(state, raw, y,
                            jax.random.fold_in(key, 0)).compile()
            flops = _flops_of(ex)
        elif mode == "train_staged":
            # sum XLA's cost analysis over the staged programs (the step
            # knows its own program signatures — fast-pallas vs generic)
            flops = 0.0
            for prog, args in step.cost_entries(
                    state, raw, y, jax.random.fold_in(key, 0)):
                flops += _flops_of(prog.lower(*args).compile()) or 0.0
            flops = flops or None
        elif mode == "infer":
            flops = _flops_of(fwd.lower(raw).compile())
        peak = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))
        note = {"mode": mode, "family": family, "batch": batch,
                "step_ms": round(dt / steps * 1e3, 3),
                "imgs_per_sec": round(batch * steps / dt, 2),
                "flops_per_step": flops,
                "mfu_vs_bf16_peak": (round(flops / (dt / steps) / peak, 4)
                                     if flops else None)}
        print("BENCH_NOTE " + json.dumps(note), file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"mfu note unavailable: {e}", file=sys.stderr)

    return batch * steps / dt


def _flops_of(executable):
    ca = executable.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0)) or None


def _run_child(mode):
    """Run one measurement in a watchdog subprocess; imgs/sec or None."""
    default = 2700 if mode == "train_staged" else 1500
    budget = int(os.environ.get("BENCH_COMPILE_BUDGET", default))
    code = (f"import bench, json; "
            f"v = bench.measure_jax(mode='{mode}'); "
            f"print('BENCH_RESULT ' + json.dumps(v))")
    try:
        proc = subprocess.run([sys.executable, "-c", code], timeout=budget,
                              capture_output=True, text=True,
                              cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        print(f"bench mode={mode} exceeded {budget}s budget",
              file=sys.stderr)
        return None
    for line in proc.stderr.splitlines():
        if line.startswith("BENCH_NOTE "):  # step-time/MFU side channel
            print(line, file=sys.stderr)
    for line in proc.stdout.splitlines():
        if line.startswith("BENCH_RESULT "):
            return float(line.split()[1])
    print(proc.stderr[-2000:], file=sys.stderr)
    return None


def _reference_baseline(kind):
    """imgs/sec of the reference-anchored torch-CPU baseline: the LITERAL
    upstream ParametrizedProcessing as the ISP half
    (benchmarks/reference_baseline.py). Generated in a subprocess if the
    cache is absent — the reference shim shadows top-level module names,
    so the measurement never runs in-process. kind: 'train' | 'infer'."""
    repo = os.path.dirname(os.path.abspath(__file__))
    cache = os.path.join(repo, "results", "torch_baseline_ref.json")
    if not os.path.exists(cache):
        subprocess.run(
            [sys.executable,
             os.path.join(repo, "benchmarks", "reference_baseline.py")],
            check=True, capture_output=True, text=True, timeout=1800,
            cwd=repo)
    with open(cache) as fh:
        return json.load(fh)[f"{kind}_imgs_per_sec"]


# per-family torch-CPU baseline caches (benchmarks/torch_baseline.py
# writes them; schema: train files carry train_imgs_per_sec, infer files
# imgs_per_sec). The flagship family instead goes through
# _reference_baseline (literal upstream ISP) with these as fallback.
FAMILY_BASELINE_FILES = {
    ("classification", "train"): ("results/torch_baseline.json",
                                  "train_imgs_per_sec"),
    ("classification", "infer"): ("results/torch_baseline_infer.json",
                                  "imgs_per_sec"),
    ("segmentation", "train"): ("results/torch_baseline_seg.json",
                                "train_imgs_per_sec"),
    ("segmentation", "infer"): ("results/torch_baseline_seg_infer.json",
                                "imgs_per_sec"),
    ("neural", "train"): ("results/torch_baseline_nn.json",
                          "train_imgs_per_sec"),
    ("neural", "infer"): ("results/torch_baseline_nn_infer.json",
                          "imgs_per_sec"),
    ("adversarial", "train"): ("results/torch_baseline_adv.json",
                               "train_imgs_per_sec"),
    # adversarial inference IS the classification forward (same models)
    ("adversarial", "infer"): ("results/torch_baseline_infer.json",
                               "imgs_per_sec"),
}

METRIC_TOKEN = {"classification": "", "segmentation": "seg_",
                "neural": "neural_", "adversarial": "adv_"}


def _family_baseline_file(family, kind):
    repo = os.path.dirname(os.path.abspath(__file__))
    path, key = FAMILY_BASELINE_FILES[(family, kind)]
    with open(os.path.join(repo, path)) as fh:
        return json.load(fh)[key]


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "benchmarks"))
    from torch_baseline import get_torch_baseline, measure_torch_cpu

    family = os.environ.get("BENCH_FAMILY", "classification")
    allowed = FAMILY_DEFAULTS[family]["modes"]
    mode = os.environ.get("BENCH_MODE", "auto")
    grace = int(os.environ.get("BENCH_GRANT_GRACE", 90))
    value = None
    used_mode = "train"
    ran_before = False
    if mode in ("auto", "train_staged") and "train_staged" in allowed:
        # staged four-program train step FIRST (identical update; each
        # program compiles within a budget window, training/core.py), the
        # monolith second as an upside attempt — the two measure within
        # ~2% of each other once warmed (r2: 2216 vs 2249 imgs/s), but
        # the monolith's single-program compile is the one at risk of
        # blowing the budget. Best of the two is reported.
        value = _run_child("train_staged")
        ran_before = True
    if mode in ("auto", "train") and "train" in allowed:
        if mode == "auto" and ran_before:
            # a killed/finished child leaves a stale single-tenant TPU
            # grant; let the relay release it first
            time.sleep(grace)
        mono = _run_child("train")
        ran_before = True
        if mono is not None and (value is None or mono > value):
            value = mono
    if value is None and mode in ("auto", "infer"):
        if mode == "auto" and ran_before:
            time.sleep(grace)  # grace only after a previous child's grant
        used_mode = "infer"
        value = _run_child("infer")
    if value is None:
        print(json.dumps({"metric": (f"raw2logit_{METRIC_TOKEN[family]}"
                                     "train_throughput"),
                          "value": None, "unit": "imgs/sec/chip",
                          "vs_baseline": None,
                          "error": "compile did not finish within budget"}))
        return

    kind = "train" if used_mode != "infer" else "infer"
    try:
        # resolve the cache against the repo directory like
        # _family_baseline_file — a cwd-relative path would miss the
        # committed cache (and re-measure) when run from elsewhere
        infer_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "results", "torch_baseline_infer.json")
        if family == "classification" and kind == "train":
            baseline = get_torch_baseline()
        elif family == "classification" and not os.path.exists(infer_cache):
            baseline = measure_torch_cpu(train=False)
            os.makedirs(os.path.dirname(infer_cache), exist_ok=True)
            with open(infer_cache, "w") as fh:
                json.dump({"imgs_per_sec": baseline}, fh)
        else:
            baseline = _family_baseline_file(family, kind)
    except Exception as e:  # noqa: BLE001 — never fail the bench on baseline
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        baseline = None

    # the flagship family's vs_baseline is anchored on the LITERAL
    # reference ISP (VERDICT r3 item 2); its hand-written baseline stays
    # as a side channel so the multipliers stay comparable across rounds.
    ref_baseline = None
    if family == "classification":
        try:
            ref_baseline = _reference_baseline(kind)
        except Exception as e:  # noqa: BLE001
            print(f"reference baseline unavailable: {e}", file=sys.stderr)

    primary = ref_baseline or baseline
    result = {
        "metric": (f"raw2logit_{METRIC_TOKEN[family]}"
                   f"{used_mode}_throughput"),
        "value": round(value, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(value / primary, 2) if primary else None,
        "baseline_kind": ("reference_isp_torch_cpu" if ref_baseline
                          else "handwritten_torch_cpu" if baseline
                          else None),
    }
    if ref_baseline and baseline:
        result["vs_baseline_handwritten"] = round(value / baseline, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
