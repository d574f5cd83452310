"""Render committed PNG figures for the three experiment-family artifacts.

The reference repo ships its experiment results as figures (heatmaps from
figures/ABtesting.py:430-487, per-stage GIFs and loss scatters from
figures/figures.py:57-92); round 5 added the quantitative JSON artifacts
for the forensics / optimization / severity-comparison families
(results/forensics_*.json, drift_optimization.json,
drift_severity_summary.json) — this tool renders those JSONs so each
family also has a committed visual deliverable:

  results/forensics_trajectories.png   accuracy + aux-SSIM per attack
                                       epoch per target, with the SSIM
                                       bound and the constrained-best
                                       selected epoch marked
  results/drift_optimization.png       joint vs frozen-ISP validation
                                       loss and accuracy curves
  results/drift_severity.png           C corruption drop per severity vs
                                       the A/B pipeline-swap drop

Run (CPU, reads only committed JSONs):
  env -u PALLAS_AXON_POOL_IPS -u PYTHONPATH JAX_PLATFORMS=cpu \
      python tools/science_figures.py [out_dir]
"""

import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# categorical slots 1/2 (colorblind-validated adjacent pair); grays for
# reference lines and text so color is carried by the series only
BLUE = "#2a78d6"
ORANGE = "#eb6834"
GRAY = "#6b7280"
GRID = "#e5e7eb"


def _style(ax):
    ax.grid(True, color=GRID, linewidth=0.8, zorder=0)
    ax.set_axisbelow(True)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(GRAY)
    ax.tick_params(colors=GRAY, labelsize=8)


def _load(name, results_dir):
    path = os.path.join(results_dir, name)
    with open(path) as fh:
        return json.load(fh)


def forensics_figure(results_dir, out_path,
                     targets=("all", "additive_layer", "gamma_correct")):
    reports = [_load(f"forensics_{t}.json", results_dir) for t in targets]
    fig, axes = plt.subplots(1, len(reports), figsize=(3.6 * len(reports), 3.2),
                             sharey=True)
    for i, (ax, rep) in enumerate(zip(axes, reports)):
        epochs = range(1, len(rep["val_accuracy_per_epoch"]) + 1)
        ax.axhline(rep["ssim_bound"], color=GRAY, linewidth=1,
                   linestyle="--", zorder=1)
        ax.plot(epochs, rep["val_accuracy_per_epoch"], color=BLUE,
                linewidth=2, label="val accuracy", zorder=3)
        ax.plot(epochs, rep["aux_ssim_per_epoch"], color=ORANGE,
                linewidth=2, label="SSIM to default ISP", zorder=3)
        sel = rep["selected_epoch"]
        if sel is not None:
            ax.plot([sel], [rep["selected_aux_ssim"]], "o", color=ORANGE,
                    markersize=8, markeredgecolor="white",
                    markeredgewidth=2, zorder=4)
            ax.plot([sel], [rep["selected_val_accuracy"]], "o", color=BLUE,
                    markersize=8, markeredgecolor="white",
                    markeredgewidth=2, zorder=4)
            ax.annotate(f"selected (epoch {sel})",
                        (sel, rep["selected_val_accuracy"]),
                        textcoords="offset points", xytext=(8, -12),
                        fontsize=8, color="#374151")
        drop = rep["selected_accuracy_drop"]
        ax.set_title(f"target: {rep['target']}  "
                     f"(drop {drop:.2f} @ SSIM "
                     f"{rep['selected_aux_ssim']:.2f})",
                     fontsize=9, color="#111827")
        ax.set_xlabel("attack epoch", fontsize=8, color=GRAY)
        ax.set_ylim(-0.05, 1.05)
        _style(ax)
        if i == 0:
            ax.set_ylabel("accuracy / SSIM", fontsize=8, color=GRAY)
        if i == len(reports) - 1:
            ax.annotate("SSIM bound", (0.98, rep["ssim_bound"]),
                        xycoords=("axes fraction", "data"),
                        textcoords="offset points", xytext=(0, 4),
                        fontsize=7, color=GRAY, ha="right")
    axes[0].legend(loc="upper right", fontsize=8, frameon=False)
    fig.suptitle("Drift forensics: adversarial-ISP attack trajectories "
                 "(constrained-best state marked)", fontsize=10)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def optimization_figure(results_dir, out_path):
    rep = _load("drift_optimization.json", results_dir)
    epochs = range(1, rep["epochs"] + 1)
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(7.6, 3.2))
    for key, color, label in (("joint", BLUE, "joint (ISP + model)"),
                              ("frozen", ORANGE, "frozen ISP")):
        ax1.plot(epochs, rep[f"{key}_val_loss"], color=color, linewidth=2,
                 label=label, zorder=3)
        ax2.plot(epochs, rep[f"{key}_val_accuracy"], color=color,
                 linewidth=2, label=label, zorder=3)
    ax1.set_ylabel("validation loss", fontsize=8, color=GRAY)
    ax1.set_title(f"mean loss: joint {rep['mean_joint_val_loss']:.2f} "
                  f"vs frozen {rep['mean_frozen_val_loss']:.2f}",
                  fontsize=9, color="#111827")
    ax2.set_ylabel("validation accuracy", fontsize=8, color=GRAY)
    ax2.set_ylim(-0.05, 1.05)
    ax2.set_title(f"epochs to acc≥0.99: joint "
                  f"{rep['epochs_to_acc99_joint']} vs frozen "
                  f"{rep['epochs_to_acc99_frozen']}",
                  fontsize=9, color="#111827")
    for ax in (ax1, ax2):
        ax.set_xlabel("epoch", fontsize=8, color=GRAY)
        _style(ax)
    ax1.legend(fontsize=8, frameon=False)
    fig.suptitle("Drift optimization: joint ISP+model training vs frozen "
                 "default ISP", fontsize=10)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def severity_figure(results_dir, out_path):
    rep = _load("drift_severity_summary.json", results_dir)
    sev = sorted(rep["c_drop_mean_by_severity"], key=int)
    drops = [rep["c_drop_mean_by_severity"][s] for s in sev]
    ab = rep["ab_offdiagonal_drop_mean"]
    fig, ax = plt.subplots(figsize=(6.2, 3.4))
    bars = ax.bar([int(s) for s in sev], drops, width=0.62, color=BLUE,
                  zorder=3, label="C corruption drop (mean)")
    for b, d in zip(bars, drops):
        ax.annotate(f"{d:.2f}", (b.get_x() + b.get_width() / 2, d),
                    textcoords="offset points", xytext=(0, 3),
                    ha="center", fontsize=7, color="#374151")
    ax.axhline(ab, color=ORANGE, linewidth=2, zorder=4,
               label="A/B pipeline-swap drop (mean)")
    ax.annotate(f"A/B swap {ab:.2f}", (0.99, ab),
                xycoords=("axes fraction", "data"),
                textcoords="offset points", xytext=(0, 4),
                fontsize=8, color=ORANGE, ha="right")
    ax.set_xlabel("corruption severity", fontsize=8, color=GRAY)
    ax.set_ylabel("mean accuracy drop", fontsize=8, color=GRAY)
    ax.set_xticks([int(s) for s in sev])
    ax.set_ylim(0, max(max(drops), ab) * 1.35)
    ax.set_title("Drift severity: ISP pipeline swap vs corruption battery\n"
                 f"(same converged checkpoints, {rep['task']})",
                 fontsize=9, color="#111827")
    _style(ax)
    ax.legend(fontsize=8, frameon=False, loc="upper left",
              bbox_to_anchor=(0.0, 0.92))
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def make_all(results_dir=None, out_dir=None):
    results_dir = results_dir or os.path.join(REPO, "results")
    out_dir = out_dir or results_dir
    os.makedirs(out_dir, exist_ok=True)
    return [
        forensics_figure(results_dir,
                         os.path.join(out_dir, "forensics_trajectories.png")),
        optimization_figure(results_dir,
                            os.path.join(out_dir, "drift_optimization.png")),
        severity_figure(results_dir,
                        os.path.join(out_dir, "drift_severity.png")),
    ]


if __name__ == "__main__":
    for path in make_all(out_dir=sys.argv[1] if len(sys.argv) > 1 else None):
        print(path)
