"""Training orchestration: CLI-parity run_train.

Mirrors the reference train.py:124-386 flow — dataset -> k-fold ->
processing-mode dispatch -> model build -> (adversarial setup) ->
per-fold train loop with validation + tracking — re-designed so the ISP
(static OR parametrized OR neural) executes inside the jitted train step on
device, and the batch is sharded over a device mesh.
"""

import argparse
import json
import os
import sys
import time
import jax
import jax.numpy as jnp
import numpy as np

from raw2logit_tpu.data import Loader, Subset, get_dataset, k_fold
from raw2logit_tpu.data.datasets import DATASET_STATS
from raw2logit_tpu.isp import (NNProcessing, ParametrizedProcessing,
                               RawToRGB, StaticPipeline)
from raw2logit_tpu.models import UNetPlusPlus, resnet_model
from raw2logit_tpu.models.resnet import load_pretrained_variables
from raw2logit_tpu.parallel import make_mesh
from raw2logit_tpu.parallel.mesh import replicated_sharding
from raw2logit_tpu.tracking import Run, track_images
from raw2logit_tpu.training import checkpoint as ckpt
from raw2logit_tpu.training.core import (TrainConfig, create_train_state,
                                         make_eval_step, make_train_step,
                                         task_loss_fn)

import flax.linen as nn


def str2bool(s):
    return s == "True" or s is True


def build_parser():
    """Full CLI surface of the reference (train.py:33-119)."""
    p = argparse.ArgumentParser(description="classification_task")
    p.add_argument("--tracking_uri", type=str, default=None,
                   help="optional MLflow server URI (local runs always "
                        "recorded under results/runs)")
    p.add_argument("--processor_uri", type=str, default=None,
                   help="checkpoint path to load the processor from")
    p.add_argument("--classifier_uri", type=str, default=None,
                   help="checkpoint path to load the classifier from")
    p.add_argument("--state_dict_uri", type=str, default=None,
                   help="path of a state_dict.json with train/valid indices")

    p.add_argument("--experiment_name", type=str,
                   default="classification learnable pipeline")
    p.add_argument("--run_name", type=str, default="test run")

    p.add_argument("--log_model", type=str2bool, default=True)
    p.add_argument("--save_locally", action="store_true",
                   help="additionally copy the final per-fold state to "
                        "saved_models/<experiment>/<run>_<fold> (the "
                        "reference's dangling TODO, train.py:49-50, "
                        "implemented)")

    p.add_argument("--track_processing", action="store_true")
    p.add_argument("--track_processing_gradients", action="store_true")
    p.add_argument("--track_save_tensors", action="store_true")
    p.add_argument("--track_predictions", action="store_true")
    p.add_argument("--track_n_images", type=int, default=5)
    p.add_argument("--track_every_epoch", action="store_true")

    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--dataset", type=str, default="Microscopy",
                   choices=["Drone", "DroneSegmentation", "Microscopy",
                            "SyntheticMicroscopy", "SyntheticDrone"])
    p.add_argument("--I_ratio", "--iso", dest="I_ratio", type=float,
                   default=1.0,
                   help="exposure-intensity variant of the dataset "
                        "(dataset.py:217,301); --iso accepted because the "
                        "reference README's example commands use it "
                        "(README.md:88 — a flag its own train.py lacks)")
    p.add_argument("--n_splits", type=int, default=1)
    p.add_argument("--train_size", type=float, default=0.8)

    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--augmentation", type=str, default="none",
                   choices=["none", "weak", "strong"])
    p.add_argument("--check_val_every_n_epoch", type=int, default=1)

    p.add_argument("--processing_mode", type=str, default="parametrized",
                   choices=["parametrized", "static", "neural_network",
                            "none"])

    p.add_argument("--classifier_network", type=str, default="ResNet18",
                   choices=["ResNet18", "ResNet34", "Resnet50"])
    p.add_argument("--classifier_pretrained", action="store_true")
    p.add_argument("--smp_encoder", type=str, default="resnet34")

    p.add_argument("--freeze_processor", action="store_true")
    p.add_argument("--freeze_classifier", action="store_true")

    p.add_argument("--sp_debayer", type=str, default="bilinear",
                   choices=["bilinear", "malvar2004", "menon2007"])
    p.add_argument("--sp_sharpening", type=str, default="sharpening_filter",
                   choices=["sharpening_filter", "unsharp_masking"])
    p.add_argument("--sp_denoising", type=str, default="gaussian_denoising",
                   choices=["gaussian_denoising", "median_denoising",
                            "fft_denoising"])

    p.add_argument("--adv_training", action="store_true")
    p.add_argument("--adv_aux_weight", type=float, default=1.0)
    p.add_argument("--adv_aux_loss", type=str, default="ssim",
                   choices=["l2", "ssim"])
    p.add_argument("--adv_noise_layer", action="store_true")
    p.add_argument("--adv_track_differences", action="store_true")
    p.add_argument("--adv_parameters", default="all",
                   choices=["all", "black_level", "white_balance",
                            "colour_correction", "gamma_correct",
                            "sharpening_filter", "gaussian_blur",
                            "additive_layer"])

    p.add_argument("--cache_downloaded_models", type=str2bool, default=True,
                   help="accepted for reference-CLI parity "
                        "(utils/base.py:190-229); the local run store never "
                        "downloads, so this is a no-op here")
    p.add_argument("--test_run", action="store_true")

    # TPU-native extras (not in the reference)
    p.add_argument("--n_devices", type=int, default=None,
                   help="devices in the data mesh (default: all)")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="task-model compute dtype (ISP always float32)")
    p.add_argument("--use_pallas", action="store_true",
                   help="fused Pallas ISP kernel (parametrized mode, "
                        "no stage tracking)")
    p.add_argument("--precompute_static", action="store_true",
                   help="static mode only: run the (deterministic) static "
                        "pipeline + normalization over the dataset ONCE "
                        "through one jitted program and train the task "
                        "model on the cached RGB — identical math "
                        "(augmentation applies after processing either "
                        "way), the ISP leaves the per-step graph")
    p.add_argument("--weight_decay", type=float, default=0.0,
                   help="coupled L2 weight decay (torch.optim.Adam "
                        "semantics, reference model.py:144-146 hardcodes "
                        "0; exposed for sweep recipes)")
    p.add_argument("--lr_schedule", type=str, default="constant",
                   choices=["constant", "cosine"],
                   help="cosine decays to 0 over the fold's total steps "
                        "so the checkpointed FINAL state is converged")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of a few train steps "
                        "into the run dir")
    p.add_argument("--staged_step", action="store_true",
                   help="use the four-program staged train step (identical "
                        "update; each program compiles separately — for "
                        "remote-compile backends where the monolithic "
                        "step's compile exceeds budget)")
    p.add_argument("--fuse_opt", action="store_true",
                   help="with --staged_step: fold the per-module Adam "
                        "applies into the two gradient programs (no "
                        "standalone opt_apply dispatch; same optimization "
                        "— Adam is per-leaf). opt_state becomes a "
                        "(proc, clf) pair, so checkpoints are only "
                        "resumable with the same flag")
    p.add_argument("--checkpoint_every_n_epochs", type=int, default=0,
                   help="periodic checkpointing for failure recovery "
                        "(0 = only final)")
    p.add_argument("--resume", action="store_true",
                   help="resume each fold from its latest periodic "
                        "checkpoint if present")
    return p


class _StaticAsModule(nn.Module):
    """Run the static pipeline + normalization inside the jitted graph.

    The reference runs the numpy ISP per-image in 16 DataLoader workers and
    nn.Identity() on device (train.py:154-173); here static mode is the same
    device graph with frozen semantics (stop_gradient)."""

    pipeline: StaticPipeline
    mean: tuple
    std: tuple

    @nn.compact
    def __call__(self, raw, train=True, taps=None):
        rgb = jax.lax.stop_gradient(self.pipeline(raw))
        mean = jnp.asarray(self.mean, rgb.dtype)
        std = jnp.asarray(self.std, rgb.dtype)
        return (rgb - mean) / std, {}


def build_processor(args, dataset, image_size=256):
    mode = args.processing_mode
    track = args.track_processing or args.track_processing_gradients
    stats = DATASET_STATS.get(args.dataset.replace("Synthetic", ""), None) \
        or DATASET_STATS["Microscopy"]
    if mode == "static":
        pipe = StaticPipeline(camera_parameters=dataset.camera_parameters,
                              debayer=args.sp_debayer,
                              sharpening=args.sp_sharpening,
                              denoising=args.sp_denoising)
        return _StaticAsModule(pipeline=pipe, mean=tuple(stats["mean"]),
                               std=tuple(stats["std"]))
    if mode == "parametrized":
        return ParametrizedProcessing(
            camera_parameters=dataset.camera_parameters,
            track_stages=track, batch_norm_output=True,
            additive_layer=args.adv_training and args.adv_noise_layer,
            image_size=image_size,
            use_pallas=getattr(args, "use_pallas", False) and not track)
    mosaic_mean = stats.get("mosaic_mean")
    mosaic_std = stats.get("mosaic_std")
    if mode == "neural_network":
        return NNProcessing(batch_norm_output=True,
                            normalize_mosaic_mean=mosaic_mean,
                            normalize_mosaic_std=mosaic_std)
    if mode == "none":
        return RawToRGB(reduce_size=True, out_channels=3,
                        normalize_mosaic_mean=mosaic_mean,
                        normalize_mosaic_std=mosaic_std)
    raise ValueError(mode)


def build_classifier(args, dataset, dtype):
    if dataset.task == "classification":
        return resnet_model(model=args.classifier_network.lower(),
                            pretrained=args.classifier_pretrained,
                            in_channels=3,
                            fc_out_features=len(dataset.classes),
                            dtype=dtype)
    return UNetPlusPlus(encoder_name=args.smp_encoder, encoder_depth=5,
                        decoder_channels=(256, 128, 64, 32, 16),
                        in_channels=3, classes=1, dtype=dtype)


def run_train(args):
    print(args)
    if getattr(args, "fuse_opt", False) and not args.staged_step:
        raise SystemExit("--fuse_opt requires --staged_step (the "
                         "monolith already fuses the optimizer)")
    training_mode = "adversarial" if args.adv_training else "default"
    if args.dataset.startswith("Synthetic"):
        dataset = get_dataset(args.dataset)
    else:
        dataset = get_dataset(args.dataset, I_ratio=args.I_ratio)
    print(f"dataset: {type(dataset).__name__}[{len(dataset)}]")
    print(f"task: {dataset.task}")
    print(f"mode: {training_mode} training")
    print(f"# cross-validation subsets: {args.n_splits}")

    if args.adv_training:
        assert args.processing_mode == "parametrized", \
            "processing_mode should be 'parametrized' for adversarial training"
        assert args.freeze_classifier, \
            "classifier should be frozen for adversarial training"
        assert not args.freeze_processor, \
            "processor should not be frozen for adversarial training"
    assert not (args.freeze_processor and args.freeze_classifier), \
        "Likely no parameters to train."

    idxs_kfold = k_fold(dataset, n_splits=args.n_splits, seed=args.seed,
                        train_size=args.train_size)

    precompute = (args.processing_mode == "static"
                  and getattr(args, "precompute_static", False))
    if precompute:
        # hoist the deterministic ISP + normalization out of the epoch
        # loop: one jitted batched pass over the dataset, then every fold
        # trains the task model directly on the cached RGB. Exact: the
        # in-graph static path is stop_gradient(pipeline) -> normalize ->
        # augment -> model in this order too (_StaticAsModule + _forward).
        from raw2logit_tpu.data.precompute import (PrecomputedRGBView,
                                                   precompute_pipeline_rgb)
        stats = DATASET_STATS.get(
            args.dataset.replace("Synthetic", ""), None) \
            or DATASET_STATS["Microscopy"]
        pipe = StaticPipeline(camera_parameters=dataset.camera_parameters,
                              debayer=args.sp_debayer,
                              sharpening=args.sp_sharpening,
                              denoising=args.sp_denoising)
        rgb = precompute_pipeline_rgb(dataset, pipe,
                                      batch_size=args.batch_size)
        rgb = ((rgb - np.asarray(stats["mean"], np.float32))
               / np.asarray(stats["std"], np.float32))
        dataset = PrecomputedRGBView(dataset, rgb)
        print(f"precomputed static ISP: {rgb.shape} cached")

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    # mesh size must divide the batch; use the largest power-of-two-ish
    # common divisor of (batch, devices)
    import math
    n_dev = args.n_devices or jax.device_count()
    n_dev = math.gcd(args.batch_size, n_dev)
    mesh = make_mesh(n_dev)
    print(f"data mesh: {n_dev} device(s)")
    sample = dataset[0][0]
    image_size = sample.shape[0]

    # cosine horizon: steps per fold (all folds share the split size; the
    # train loader drops the ragged tail like the in-loop Loader does)
    n_train = (args.batch_size if args.test_run
               else int(len(dataset) * args.train_size))
    steps_per_epoch = max(1, n_train // args.batch_size)
    cfg = TrainConfig(
        task=dataset.task,
        lr=args.lr,
        lr_schedule=getattr(args, "lr_schedule", "constant"),
        total_steps=steps_per_epoch * args.epochs,
        weight_decay=getattr(args, "weight_decay", 0.0),
        augmentation=args.augmentation,
        freeze_processor=(args.freeze_processor
                          or args.processing_mode == "static"),
        freeze_classifier=args.freeze_classifier,
        adv_training=args.adv_training,
        adv_aux_weight=args.adv_aux_weight,
        adv_aux_loss=args.adv_aux_loss,
        adv_parameters=args.adv_parameters or "all",
        loss_weight=-1.0 if args.adv_training else 1.0,
    )

    parent = Run(args.experiment_name, args.run_name,
                 tracking_uri=args.tracking_uri)
    results = []

    for k_iter, (train_indices, valid_indices) in enumerate(idxs_kfold):
        print(f"K_fold subset: {k_iter + 1}/{args.n_splits}")

        # precompute: the ISP already ran (dataset yields normalized RGB)
        processor = (None if precompute
                     else build_processor(args, dataset, image_size))
        classifier = build_classifier(args, dataset, dtype)

        state_dict = {k: v for k, v in vars(args).items()}
        if args.state_dict_uri:
            with open(args.state_dict_uri) as fh:
                loaded = json.load(fh)
            train_indices = loaded["train_indices"]
            valid_indices = loaded["valid_indices"]
            state_dict.update(loaded)

        if dataset.task == "classification":
            state_dict["classes"] = dataset.classes
        state_dict["train_indices"] = list(map(int, train_indices))
        state_dict["valid_indices"] = list(map(int, valid_indices))
        state_dict["elements in train set"] = len(train_indices)
        state_dict["elements in test set"] = len(valid_indices)

        if args.test_run:
            train_indices = train_indices[: args.batch_size]
            valid_indices = valid_indices[: args.batch_size]

        train_set = Subset(dataset, train_indices)
        valid_set = Subset(dataset, valid_indices)
        track_set = Subset(dataset, list(range(args.track_n_images)))

        train_loader = Loader(train_set, args.batch_size, shuffle=True,
                              seed=args.seed, mesh=mesh)
        assert len(train_loader) > 0, (
            f"train split ({len(train_set)} items) is smaller than "
            f"--batch_size {args.batch_size}; nothing would train")
        valid_loader = Loader(valid_set, args.batch_size, shuffle=False,
                              drop_last=False)
        track_loader = Loader(track_set, args.batch_size, shuffle=False,
                              drop_last=False)

        run = parent.child(f"{args.run_name}_{k_iter}")
        if not args.resume:
            # A fresh (non-resume) training into a reused run dir must not
            # append onto a previous attempt's metrics: read_metrics() would
            # return a mixed-provenance trajectory (the first committed r5
            # forensics_all artifact carried 3 stale epochs from a killed
            # earlier attempt this way). --resume keeps the append semantics
            # the resume-safe sweep relies on.
            stale_metrics = os.path.join(run.dir, "metrics.jsonl")
            if os.path.exists(stale_metrics):
                os.remove(stale_metrics)
        run.log_state_dict(state_dict)
        run.log_params({"dataset": args.dataset,
                        "processing_mode": args.processing_mode,
                        "training_mode": training_mode,
                        **({"adv_aux_weight": args.adv_aux_weight,
                            "adv_aux_loss": args.adv_aux_loss}
                           if args.adv_training else {})})
        with open(os.path.join(run.dir, "cli.txt"), "w") as fh:
            fh.write("python " + " ".join(sys.argv) + "\n")

        rng = jax.random.key(args.seed)
        sample_raw = jnp.zeros((args.batch_size,) + sample.shape,
                               jnp.float32)
        state, tx = create_train_state(cfg, processor, classifier,
                                       sample_raw, rng,
                                       split_opt=args.fuse_opt)

        # ImageNet-pretrained init: overlay converted torchvision weights
        # onto the freshly-initialized classifier (reference model.py:15-23
        # and smp encoder_weights='imagenet', train.py:218-225).
        # --classifier_pretrained is explicit -> missing weights raise (in
        # resnet_model, at build time); the segmentation encoder default is
        # best-effort (this image cannot download ImageNet weights).
        pretrained_applied = []
        if dataset.task == "classification" and args.classifier_pretrained:
            cvars = {"params": state.clf_params,
                     "batch_stats": state.clf_stats}
            cvars, pretrained_applied = load_pretrained_variables(
                args.classifier_network.lower(), cvars)
        elif dataset.task == "segmentation":
            cvars = {"params": state.clf_params,
                     "batch_stats": state.clf_stats}
            cvars, pretrained_applied = load_pretrained_variables(
                args.smp_encoder.lower(), cvars, prefix=("encoder",),
                required=False)
        if pretrained_applied:
            state = state.replace(clf_params=cvars["params"],
                                  clf_stats=cvars["batch_stats"])
            print(f"applied {len(pretrained_applied)} pretrained arrays "
                  "to the classifier backbone")
        if args.processing_mode == "neural_network":
            # neural-ISP encoder weights (pipeline_torch.py:97-103 uses an
            # imagenet resnet34 encoder); depth-3 truncation -> best-effort
            pvars = {"params": state.proc_params,
                     "batch_stats": state.proc_stats}
            pvars, proc_applied = load_pretrained_variables(
                "resnet34", pvars, prefix=("model", "encoder"),
                required=False, ignore_missing=True)
            if proc_applied:
                state = state.replace(proc_params=pvars["params"],
                                      proc_stats=pvars["batch_stats"])
                pretrained_applied = pretrained_applied + proc_applied
                print(f"applied {len(proc_applied)} pretrained arrays "
                      "to the neural-ISP encoder")

        # resume sub-trees (processor_uri / classifier_uri point at the
        # per-component checkpoints written below)
        if args.processor_uri:
            restored = ckpt.restore_like(
                args.processor_uri,
                {"params": state.proc_params,
                 "batch_stats": state.proc_stats})
            state = state.replace(proc_params=restored["params"],
                                  proc_stats=restored["batch_stats"])
        if args.classifier_uri:
            restored = ckpt.restore_like(
                args.classifier_uri,
                {"params": state.clf_params,
                 "batch_stats": state.clf_stats})
            state = state.replace(clf_params=restored["params"],
                                  clf_stats=restored["batch_stats"])
        if args.processor_uri or args.classifier_uri or pretrained_applied:
            state = jax.device_put(state, replicated_sharding(mesh))

        if args.staged_step:
            from raw2logit_tpu.training.core import make_staged_train_step
            train_step = make_staged_train_step(cfg, processor, classifier,
                                                tx, fuse_opt=args.fuse_opt)
        else:
            train_step = make_train_step(cfg, processor, classifier, tx)
        eval_step = make_eval_step(cfg, processor, classifier)

        key = jax.random.key(args.seed + k_iter)
        t0 = time.time()

        start_epoch = 0
        ckpt_root = os.path.join(run.dir, "checkpoints")
        if args.resume and os.path.isdir(ckpt_root):
            import re
            # strictly 'epoch_NNNN': an interrupted orbax save leaves
            # 'epoch_NNNN.orbax-checkpoint-tmp-*' dirs that must not be
            # parsed (or resumed from)
            epochs_done = sorted(
                int(m.group(1)) for d in os.listdir(ckpt_root)
                if (m := re.fullmatch(r"epoch_(\d+)", d)))
            if epochs_done:
                start_epoch = epochs_done[-1]
                state = ckpt.restore_like(
                    os.path.join(ckpt_root, f"epoch_{start_epoch:04d}"),
                    state)
                # orbax commits restored arrays to one device; re-replicate
                # over the mesh so they compose with the sharded batch
                state = jax.device_put(
                    state, replicated_sharding(mesh))
                print(f"[fold {k_iter}] resumed from epoch {start_epoch}")

        # profile steps [1, 4) globally (skips the step-0 compile)
        prof_active, prof_done, steps_done = False, not args.profile, 0
        for epoch in range(start_epoch, args.epochs):
            epoch_metrics = []
            for bi, (raw, y) in enumerate(train_loader):
                if not prof_done and not prof_active and steps_done >= 1:
                    jax.profiler.start_trace(run.artifact_dir("profile"))
                    prof_active = True
                key, sub = jax.random.split(key)
                state, mets = train_step(state, jnp.asarray(raw),
                                         jnp.asarray(y), sub)
                steps_done += 1
                if prof_active and steps_done >= 4:
                    jax.block_until_ready(mets["loss"])
                    jax.profiler.stop_trace()
                    prof_active, prof_done = False, True
                epoch_metrics.append(mets)
            train_mets = {f"train_{k}": float(np.mean([float(m[k])
                                                       for m in epoch_metrics]))
                          for k in epoch_metrics[0]}
            run.log_metrics(train_mets, step=epoch)

            if (args.check_val_every_n_epoch > 0
                    and (epoch + 1) % args.check_val_every_n_epoch == 0):
                val_metrics, val_ns = [], []
                for raw, y in valid_loader:
                    key, sub = jax.random.split(key)
                    _, mets = eval_step(state, jnp.asarray(raw),
                                        jnp.asarray(y), sub)
                    val_metrics.append(mets)
                    val_ns.append(len(raw))
                # size-weighted mean: the ragged final batch (its shape is
                # constant across epochs, so it costs one extra cached
                # compile) must not count as much as the full batches
                w = np.asarray(val_ns, np.float64)
                w /= w.sum()
                val_mets = {f"val_{k}": float(np.sum(
                    w * np.asarray([float(m[k]) for m in val_metrics])))
                    for k in val_metrics[0]}
                run.log_metrics(val_mets, step=epoch)
                print(f"[fold {k_iter}] epoch {epoch + 1}/{args.epochs} "
                      f"{train_mets} {val_mets}")

            if args.track_processing and args.track_every_epoch:
                _track(args, cfg, processor, classifier, state, track_loader,
                       run.artifact_dir("results", f"epoch_{epoch + 1:04d}"))

            if (args.checkpoint_every_n_epochs
                    and (epoch + 1) % args.checkpoint_every_n_epochs == 0):
                ckpt.save_state(state, os.path.join(
                    ckpt_root, f"epoch_{epoch + 1:04d}"))

        if prof_active:  # training ended inside the trace window
            jax.profiler.stop_trace()
            prof_done = True

        print(f"[fold {k_iter}] trained {args.epochs} epochs "
              f"in {time.time() - t0:.1f}s")

        if args.track_processing and not args.track_every_epoch:
            _track(args, cfg, processor, classifier, state, track_loader,
                   run.artifact_dir("results"))

        if args.log_model:
            # per-component checkpoints: the fetch-by-URI resume targets
            # (the reference's processor/classifier extraction from logged
            # models, utils/base.py:249-270)
            if state.proc_params:
                ckpt.save_state(
                    {"params": state.proc_params,
                     "batch_stats": state.proc_stats},
                    os.path.join(run.dir, "checkpoints", "processor"))
            ckpt.save_state(
                {"params": state.clf_params,
                 "batch_stats": state.clf_stats},
                os.path.join(run.dir, "checkpoints", "classifier"))

        if args.save_locally:
            local_dir = os.path.join("saved_models", args.experiment_name,
                                     f"{args.run_name}_{k_iter}")
            ckpt.save_state(state, local_dir)
            with open(os.path.join(local_dir, "state_dict.json"),
                      "w") as fh:
                json.dump(state_dict, fh, indent=2, default=str)
            print(f"saved locally -> {local_dir}")

        results.append({"state": state, "run": run,
                        "valid_indices": valid_indices})
        run.close()

    parent.close()
    return results


def _track(args, cfg, processor, classifier, state, loader, save_loc):
    if args.processing_mode in ("static",):
        return
    variables = {"params": state.proc_params}
    if state.proc_stats:
        variables["batch_stats"] = state.proc_stats
    clf_variables = {"params": state.clf_params}
    if state.clf_stats:
        clf_variables["batch_stats"] = state.clf_stats
    ref_variables = None
    if cfg.adv_training and args.adv_track_differences:
        ref_variables = {"params": state.ref_proc_params}
        if state.ref_proc_stats:
            ref_variables["batch_stats"] = state.ref_proc_stats
    track_images(processor, variables, classifier, clf_variables,
                 task_loss_fn(cfg), loader,
                 reference_variables=ref_variables,
                 track_processing=args.track_processing,
                 track_gradients=args.track_processing_gradients,
                 track_predictions=args.track_predictions,
                 save_tensors=args.track_save_tensors,
                 save_loc=save_loc)


def main(argv=None):
    args = build_parser().parse_args(argv)
    os.makedirs("results", exist_ok=True)
    return run_train(args)


if __name__ == "__main__":
    main()
