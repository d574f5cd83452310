"""The three experiment families' example drivers run headless in CI
(VERDICT r4 item 6), and the committed forensics/optimization artifacts
carry regression pins (item 3): the adversarial ISP search must collapse
accuracy while the SSIM regularizer holds, and joint ISP training must
match or beat the frozen default."""

import importlib.util
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


def _load_example(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "examples", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tiny_dataset(monkeypatch):
    import raw2logit_tpu.training.train as T
    from raw2logit_tpu.data import SyntheticRawClassification
    monkeypatch.setattr(
        T, "get_dataset",
        lambda name, **kw: SyntheticRawClassification(n=8, h=64, w=64,
                                                      seed=5))


def test_drift_forensics_smoke(tmp_path, monkeypatch):
    """The forensics loop (pretrain frozen-ISP classifier -> adversarial
    ISP search -> JSON report with accuracy/SSIM trajectories and
    per-parameter drift) runs end-to-end on tiny synthetic shapes."""
    monkeypatch.chdir(tmp_path)
    _tiny_dataset(monkeypatch)
    mod = _load_example("drift_forensics")
    reports = mod.run_forensics(targets=("gamma_correct",), pre_epochs=1,
                                adv_epochs=1, batch_size=4,
                                out_dir=str(tmp_path / "out"), track=False)
    (report,) = reports
    assert report["target"] == "gamma_correct"
    assert 0.0 <= report["final_val_accuracy"] <= 1.0
    assert len(report["aux_ssim_per_epoch"]) == 1
    # constrained-best selection fields are present and consistent
    if report["selected_epoch"] is not None:
        assert report["selected_aux_ssim"] >= report["ssim_bound"]
        assert set(report["selected_param_drift_relmax"]) == set(
            report["param_drift_relmax"])
    # targeted attack: only gamma (and the injected additive/noise
    # layer) may drift; every other ISP parameter is frozen
    drift = report["param_drift_relmax"]
    assert any("gamma" in k for k in drift)
    for name, rel in drift.items():
        if "gamma" not in name and "additive" not in name:
            assert rel == 0.0, (name, rel)
    with open(tmp_path / "out" / "forensics_gamma_correct.json") as fh:
        assert json.load(fh) == report


def test_forensics_select_epoch():
    """Constrained-best selection: max accuracy drop subject to
    SSIM >= bound, ties broken toward max SSIM (nearest destructive
    configuration); None when no epoch holds the bound."""
    mod = _load_example("drift_forensics")
    sel = mod.select_epoch
    # max drop under the bound wins even if later epochs drop more
    assert sel(1.0, [0.5, 0.3, 0.2], [0.9, 0.6, 0.3], 0.5) == 1
    # tie on drop -> nearest (max SSIM)
    assert sel(1.0, [0.4, 0.4, 0.4], [0.7, 0.9, 0.8], 0.5) == 1
    # nothing qualifies
    assert sel(1.0, [0.4, 0.4], [0.3, 0.1], 0.5) is None
    # everything qualifies, no drop anywhere -> max SSIM
    assert sel(1.0, [1.0, 1.0], [0.99, 0.97], 0.5) == 0
    # bound exactly met qualifies
    assert sel(1.0, [0.2], [0.5], 0.5) == 0


def test_drift_optimization_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _tiny_dataset(monkeypatch)
    mod = _load_example("drift_optimization")
    report = mod.run_optimization(epochs=1, batch_size=4,
                                  out_dir=str(tmp_path / "out"))
    assert len(report["frozen_val_loss"]) == 1
    assert len(report["joint_val_loss"]) == 1
    assert os.path.exists(tmp_path / "out" / "drift_optimization.json")


def test_drift_cycle_smoke(tmp_path, monkeypatch):
    """The third experiment family's driver (train per static pipeline ->
    A/B table -> heatmap -> matched/swapped summary) runs end-to-end on
    tiny shapes; guards the table-consumer against format changes (the
    '_meta' config-fingerprint key broke the summary loop once)."""
    monkeypatch.chdir(tmp_path)
    _tiny_dataset(monkeypatch)
    # the AB evaluator builds its own dataset: shrink it the same way
    import raw2logit_tpu.evaluation.abtesting as AB
    from raw2logit_tpu.data import SyntheticRawClassification
    monkeypatch.setattr(
        AB, "get_dataset",
        lambda name, **kw: SyntheticRawClassification(n=8, h=64, w=64,
                                                      seed=5))
    mod = _load_example("drift_cycle")
    summary = mod.run_cycle(
        train_pipelines=[("bilinear", "sharpening_filter",
                          "gaussian_denoising")],
        epochs=1, batch_size=4,
        table_path=str(tmp_path / "tables" / "ab.json"))
    assert 0.0 <= summary["matched_acc"] <= 1.0
    assert os.path.exists(summary["table_path"])
    assert os.path.exists(summary["heatmap"])
    with open(summary["table_path"]) as fh:
        table = json.load(fh)
    assert "_meta" in table and any("__VS__" in k for k in table)


def _artifact(name):
    path = os.path.join(REPO, "results", name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not generated yet (examples/ writes it)")
    with open(path) as fh:
        return json.load(fh)


@pytest.mark.parametrize("target", ["all", "additive_layer"])
def test_forensics_artifact_pins(target):
    """Committed forensics outcome: the adversarial ISP search found a
    configuration that drops the frozen classifier's accuracy by a clear
    margin while staying close to the default pipeline's images
    (reference README.md:100-118's failure-mode search, quantified).
    The pinned state is the CONSTRAINED-BEST epoch — max accuracy drop
    subject to SSIM >= the bound — because the negated task loss is
    unbounded and any fixed proximity weight eventually shreds the
    images (see examples/drift_forensics.py's docstring on both the
    reference's aux sign and the selection protocol)."""
    rep = _artifact(f"forensics_{target}.json")
    assert rep["aux_weight"] < 0, "proximity reward requires weight < 0"
    assert rep["baseline_val_accuracy"] >= 0.85, \
        "baseline classifier did not converge"
    assert rep["selected_epoch"] is not None, \
        "no attack epoch held the SSIM bound"
    assert rep["selected_accuracy_drop"] >= 0.25, rep
    assert rep["selected_aux_ssim"] >= rep["ssim_bound"] >= 0.5, rep
    assert max(rep["selected_param_drift_relmax"].values()) > 0.0
    # when the selected state was recovered by deterministic replay, the
    # replayed epoch reproduced the original trajectory's metrics
    assert rep["selection_replay_match"] in (None, True), rep
    # the unconstrained end state is documented alongside
    assert len(rep["val_accuracy_per_epoch"]) >= rep["selected_epoch"]


def test_forensics_targeted_pin():
    """Committed single-parameter attack: a gamma-only adversary drifts
    ONLY gamma (every other ISP parameter frozen) and the SSIM bound
    holds; a lone gamma knob under the proximity reward is a weak attack,
    so no accuracy-collapse margin is pinned — the committed number
    documents how much (or little) it buys."""
    rep = _artifact("forensics_gamma_correct.json")
    drift = rep["param_drift_relmax"]
    assert drift["gamma_correct"] > 0.01, "the attack never moved gamma"
    for name, rel in drift.items():
        if "gamma" not in name:
            assert rel == 0.0, (name, rel)
    assert rep["final_aux_ssim"] >= 0.9, rep
    assert rep["accuracy_drop"] >= 0.0, rep


def test_optimization_artifact_pins():
    """Committed drift-optimization outcome: joint ISP+classifier
    training matches or beats the frozen default ISP on the LEARNING
    CURVE — lower mean val loss over training and convergence no later
    (reference README.md:120-139: data generation helps the task model
    learn better/faster; final-epoch loss once both arms sit at
    accuracy 1.0 is noise at the floor)."""
    rep = _artifact("drift_optimization.json")
    lf, lj = rep["frozen_val_loss"], rep["joint_val_loss"]
    assert sum(lj) / len(lj) <= sum(lf) / len(lf), rep

    def first_at(accs, thresh=0.99):
        return next((i for i, a in enumerate(accs) if a >= thresh),
                    len(accs))

    assert (first_at(rep["joint_val_accuracy"])
            <= first_at(rep["frozen_val_accuracy"])), rep
    assert rep["joint_val_accuracy"][-1] >= 0.85, rep


def test_science_figures_render(tmp_path):
    """tools/science_figures.py renders the three experiment-family
    figures from the committed JSON artifacts (the reference ships its
    experiment results as figures — figures/ABtesting.py:430-487,
    figures/figures.py:57-92; this keeps the forensics / optimization /
    severity families figure-backed too)."""
    for name in ("forensics_all.json", "forensics_additive_layer.json",
                 "forensics_gamma_correct.json", "drift_optimization.json",
                 "drift_severity_summary.json"):
        if not os.path.exists(os.path.join(REPO, "results", name)):
            pytest.skip(f"{name} not generated yet")
    spec = importlib.util.spec_from_file_location(
        "science_figures", os.path.join(REPO, "tools", "science_figures.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    paths = mod.make_all(out_dir=str(tmp_path))
    assert len(paths) == 3
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 10_000
