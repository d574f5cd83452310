#!/usr/bin/env python
"""Drift forensics (offline, synthetic): adversarially optimize the ISP
parameters against a frozen classifier, SSIM-regularized toward the
default pipeline, and COMMIT the quantitative outcome.

Reproduces the reference's failure-mode search (README.md:100-118,
train.py:241-273) and writes results/forensics_<target>.json per
adversarial-parameter target: baseline accuracy (the frozen classifier
on the default ISP it was trained on), the per-epoch accuracy and
aux-SSIM trajectory under attack, the per-parameter drift of the
adversarial ISP, and the CONSTRAINED-BEST attack state (below) —
the experiment's RESULT, not just its machinery (VERDICT r4 item 3).
tests/test_examples.py pins the semantics: the attack must collapse
accuracy while staying close to the default pipeline's images.

SIGN OF aux_weight: the aux term added to the (negated) task loss is
weight * SSIM(default RGB, adversarial RGB), exactly the reference's
AuxLoss (utils/base.py:346-358). Since the optimizer MINIMIZES the
total, a POSITIVE weight (the reference's default, train.py:105)
rewards driving SSIM DOWN — the opposite of README.md:100-118's
"regularized to stay close to the default pipeline". The forensics
experiment therefore runs with a NEGATIVE weight (proximity reward).

CONSTRAINED-BEST PROTOCOL: the negated task loss is unbounded below,
so with ANY fixed proximity weight a long enough attack eventually
shreds the images (measured: target=all at lr 1e-2 / weight -1 is at
SSIM 0.16 after one epoch and 0.07 after eight). The forensic question
is the constrained optimum along the attack path — the largest accuracy
drop among states whose SSIM to the default pipeline stays >= a bound —
so the experiment records the whole trajectory, selects the best epoch
under the bound (max drop; ties broken toward max SSIM = the NEAREST
destructive configuration), and re-runs the attack deterministically
for exactly that many epochs (same seed, same keyed-PRNG chain, same
graph) to recover that epoch's parameter state for the drift report.
The end-of-attack state is reported alongside (final_* fields) to
document where the unconstrained dynamics go.

Run CPU-only:
  env -u PALLAS_AXON_POOL_IPS -u PYTHONPATH JAX_PLATFORMS=cpu \
      python examples/drift_forensics.py [--targets all gamma_correct]

Extra train.py flags pass through, e.g. --use_pallas --staged_step
drives the whole loop with the fused kernels on the real TPU.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raw2logit_tpu.utils import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

# per-target attack hyperparameters: 'all' includes black_level, whose
# Adam-scale-free updates shred the image within one epoch at lr 1e-2
# (SSIM 0.16 after 6 steps) — a finer lr samples the high-SSIM region
# of the attack path at epoch granularity so the constrained optimum
# is observable.
PER_TARGET = {"all": {"lr": 1e-3, "epochs": 24}}


def select_epoch(baseline_acc, accs, ssims, ssim_bound):
    """Constrained-best attack epoch: among epochs whose SSIM to the
    default pipeline is >= ssim_bound, pick the max accuracy drop;
    break ties toward max SSIM (the NEAREST destructive configuration).
    Returns the 0-based epoch index, or None if no epoch qualifies."""
    qualifying = [i for i, s in enumerate(ssims) if s >= ssim_bound]
    if not qualifying:
        return None
    return max(qualifying,
               key=lambda i: (baseline_acc - accs[i], ssims[i]))


def _flat_params(tree, prefix=()):
    import numpy as np
    if hasattr(tree, "items"):
        out = {}
        for k, v in tree.items():
            out.update(_flat_params(v, prefix + (str(k),)))
        return out
    return {"/".join(prefix): np.asarray(tree, np.float32)}


def _drift(state, ref_state=None):
    import numpy as np
    adv_flat = _flat_params(state.proc_params)
    ref_flat = _flat_params(state.ref_proc_params)
    drift = {}
    for name, a in adv_flat.items():
        r = ref_flat[name]
        denom = float(np.abs(r).max()) or 1.0
        drift[name] = round(float(np.abs(a - r).max()) / denom, 5)
    return drift


def run_forensics(targets=("all", "additive_layer", "gamma_correct"),
                  pre_epochs=12, adv_epochs=8, batch_size=8,
                  aux_weight=-1.0, ssim_bound=0.5, out_dir="results",
                  extra=(), track=True, per_target=None,
                  reuse_pretrain=False):
    """Pretrain once (classifier on the FROZEN default ISP — so the
    frozen-classifier baseline is exactly its own training pipeline),
    then run one adversarial ISP search per target and select the
    constrained-best attack state (see module docstring). Returns the
    list of per-target report dicts (also written to out_dir)."""
    import numpy as np
    from raw2logit_tpu.training.train import build_parser, run_train
    extra = list(extra)
    if per_target is None:
        per_target = PER_TARGET

    pre = ["--dataset", "SyntheticMicroscopy", "--processing_mode",
           "parametrized", "--freeze_processor",
           "--epochs", str(pre_epochs), "--batch_size", str(batch_size),
           "--n_splits", "1", "--lr", "1e-3", "--weight_decay", "1e-3",
           "--lr_schedule", "cosine", "--augmentation", "weak",
           "--experiment_name", "forensics", "--run_name", "pretrain",
           *extra]
    clf_ckpt = os.path.join("results", "runs", "forensics", "pretrain",
                            "pretrain_0", "checkpoints", "classifier")
    if reuse_pretrain and os.path.isdir(clf_ckpt):
        from raw2logit_tpu.tracking.run import Run
        pre_run = Run("forensics", "pretrain")
        pre_run = pre_run.child("pretrain_0")
    else:
        results = run_train(build_parser().parse_args(pre))
        pre_run = results[0]["run"]
        clf_ckpt = os.path.join(pre_run.dir, "checkpoints", "classifier")
    pre_metrics = pre_run.read_metrics()
    baseline_acc = [m["val_accuracy"] for m in pre_metrics
                    if "val_accuracy" in m][-1]
    print(f"baseline (frozen classifier on default ISP): "
          f"val_accuracy={baseline_acc:.3f}")

    # per-stage diff/gradient artifacts need the staged (tracking) ISP,
    # whose autodiff backward this environment's remote compiler cannot
    # build — keep them for CPU runs only (ROUND2_NOTES §3)
    tracking = [] if (not track or "--use_pallas" in extra) else [
        "--adv_track_differences", "--track_processing",
        "--track_processing_gradients"]

    def attack(target, run_name, epochs, lr):
        adv = ["--dataset", "SyntheticMicroscopy", "--processing_mode",
               "parametrized", "--adv_training", "--freeze_classifier",
               "--classifier_uri", clf_ckpt,
               "--adv_aux_loss", "ssim",
               "--adv_aux_weight", str(aux_weight),
               "--adv_noise_layer", "--adv_parameters", target,
               *tracking,
               "--epochs", str(epochs),
               "--batch_size", str(batch_size), "--n_splits", "1",
               "--lr", str(lr), "--experiment_name", "forensics",
               "--run_name", run_name, *extra]
        return run_train(build_parser().parse_args(adv))[0]

    reports = []
    for target in targets:
        cfg = per_target.get(target, {})
        epochs = int(cfg.get("epochs", adv_epochs))
        lr = float(cfg.get("lr", 1e-2))
        res = attack(target, f"adv_{target}", epochs, lr)
        run, state = res["run"], res["state"]

        metrics = run.read_metrics()
        accs = [m["val_accuracy"] for m in metrics if "val_accuracy" in m]
        # aux loss = weight * SSIM(default RGB, adversarial RGB)
        ssims = [m["val_loss_aux"] / aux_weight for m in metrics
                 if "val_loss_aux" in m]

        i_sel = select_epoch(baseline_acc, accs, ssims, ssim_bound)
        sel_epoch = sel_acc = sel_ssim = sel_drift = None
        replay_match = None
        if i_sel is not None:
            if i_sel == len(accs) - 1:
                sel_state, sel_run_metrics = state, None
            else:
                # deterministic replay: same seed => identical keyed-PRNG
                # chain and data order, so stopping at epoch i_sel+1
                # reproduces that epoch's state bit-for-bit
                res_sel = attack(target, f"adv_{target}_sel",
                                 i_sel + 1, lr)
                sel_state = res_sel["state"]
                sm = res_sel["run"].read_metrics()
                sel_run_metrics = (
                    [m["val_accuracy"] for m in sm
                     if "val_accuracy" in m][-1],
                    [m["val_loss_aux"] / aux_weight for m in sm
                     if "val_loss_aux" in m][-1])
            sel_epoch = i_sel + 1
            sel_acc, sel_ssim = float(accs[i_sel]), float(ssims[i_sel])
            if sel_run_metrics is not None:
                replay_match = bool(
                    abs(sel_run_metrics[0] - sel_acc) < 1e-6
                    and abs(sel_run_metrics[1] - sel_ssim) < 1e-6)
                if not replay_match:
                    print(f"[{target}] WARNING: selection replay diverged "
                          f"(traj acc/ssim {sel_acc:.4f}/{sel_ssim:.4f} vs "
                          f"replay {sel_run_metrics[0]:.4f}/"
                          f"{sel_run_metrics[1]:.4f})")
                    sel_acc, sel_ssim = sel_run_metrics
            sel_drift = _drift(sel_state)

        report = {
            "target": target,
            "aux_weight": aux_weight,
            "attack_lr": lr,
            "ssim_bound": ssim_bound,
            "baseline_val_accuracy": round(float(baseline_acc), 4),
            "val_accuracy_per_epoch": [round(float(a), 4) for a in accs],
            "aux_ssim_per_epoch": [round(float(s), 4) for s in ssims],
            # end-of-attack state (unconstrained dynamics)
            "final_val_accuracy": round(float(accs[-1]), 4),
            "accuracy_drop": round(float(baseline_acc - accs[-1]), 4),
            "final_aux_ssim": round(float(ssims[-1]), 4),
            "param_drift_relmax": _drift(state),
            # constrained-best state (the forensic finding)
            "selected_epoch": sel_epoch,
            "selected_val_accuracy": (None if sel_acc is None
                                      else round(sel_acc, 4)),
            "selected_accuracy_drop": (
                None if sel_acc is None
                else round(float(baseline_acc) - sel_acc, 4)),
            "selected_aux_ssim": (None if sel_ssim is None
                                  else round(sel_ssim, 4)),
            "selected_param_drift_relmax": sel_drift,
            "selection_replay_match": replay_match,
            "stage_artifacts": (os.path.join(run.dir, "results")
                                if tracking else None),
        }
        reports.append(report)
        os.makedirs(out_dir, exist_ok=True)
        out = os.path.join(out_dir, f"forensics_{target}.json")
        with open(out, "w") as fh:
            json.dump(report, fh, indent=2)
        if sel_epoch is None:
            print(f"[{target}] NO epoch held SSIM >= {ssim_bound}; "
                  f"end state: accuracy {baseline_acc:.3f} -> "
                  f"{accs[-1]:.3f}, SSIM {ssims[-1]:.3f} -> {out}")
        else:
            print(f"[{target}] constrained-best (epoch {sel_epoch}): "
                  f"accuracy {baseline_acc:.3f} -> {sel_acc:.3f} "
                  f"(drop {report['selected_accuracy_drop']:.3f}) at "
                  f"SSIM {sel_ssim:.3f} >= {ssim_bound}; end state "
                  f"acc {accs[-1]:.3f} / SSIM {ssims[-1]:.3f} -> {out}")
    return reports


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--targets", nargs="+",
                   default=["all", "additive_layer", "gamma_correct"])
    p.add_argument("--pre_epochs", type=int, default=12)
    p.add_argument("--adv_epochs", type=int, default=8,
                   help="attack length for targets without a PER_TARGET "
                        "override (committed recipe: 8 @ lr 1e-2; "
                        "'all' overrides to 24 @ 1e-3)")
    p.add_argument("--aux_weight", type=float, default=-1.0,
                   help="weight on SSIM(default, adversarial) added to "
                        "the negated task loss; NEGATIVE rewards staying "
                        "close to the default pipeline (see module "
                        "docstring for why the reference's positive "
                        "default does the opposite)")
    p.add_argument("--ssim_bound", type=float, default=0.5,
                   help="constrained-best selection bound: the reported "
                        "attack is the strongest epoch whose SSIM to the "
                        "default pipeline stays >= this")
    p.add_argument("--reuse_pretrain", action="store_true",
                   help="skip pretraining when the frozen-classifier "
                        "checkpoint already exists")
    args, extra = p.parse_known_args()
    run_forensics(targets=args.targets, pre_epochs=args.pre_epochs,
                  adv_epochs=args.adv_epochs, aux_weight=args.aux_weight,
                  ssim_bound=args.ssim_bound, extra=extra,
                  reuse_pretrain=args.reuse_pretrain)


if __name__ == "__main__":
    main()
