"""Evaluation harness: A/B cells on synthetic data, table+heatmap plumbing,
figure tooling."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from raw2logit_tpu.evaluation.abtesting import (ABTesting, ab_show_table,
                                                pipeline_grid, pipeline_name)


def test_pipeline_grid_is_12():
    assert len(pipeline_grid()) == 12
    names = [pipeline_name(*p) for p in pipeline_grid()]
    assert len(set(names)) == 12


def test_ab_cell_on_synthetic(tmp_path):
    ab = ABTesting("SyntheticMicroscopy", batch_size=4)
    ds = ab.dataset
    # train a nothing-model: random-init classifier evaluated directly
    from raw2logit_tpu.models import resnet_model
    clf = resnet_model("resnet18", fc_out_features=len(ds.classes))
    sample = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = clf.init(jax.random.key(0), sample, train=False)
    mets = ab.evaluate(clf, variables, list(range(4)),
                       "bilinear", "sharpening_filter", "gaussian_denoising")
    assert set(mets) == {"accuracy", "precision", "recall", "f1"}
    assert 0.0 <= mets["accuracy"] <= 1.0

    # corruption variant
    mets_c = ab.evaluate(clf, variables, list(range(4)),
                         "bilinear", "sharpening_filter",
                         "gaussian_denoising", corruption="gaussian_noise")
    assert 0.0 <= mets_c["accuracy"] <= 1.0


def test_ab_show_table(tmp_path):
    table = {
        "a__VS__a": {"accuracy": 0.9},
        "a__VS__b": {"accuracy": 0.5},
        "b__VS__a": {"accuracy": 0.4},
        "b__VS__b": {"accuracy": 0.8},
    }
    path = str(tmp_path / "t.json")
    with open(path, "w") as fh:
        json.dump(table, fh)
    out = ab_show_table(path, metric="accuracy")
    assert os.path.exists(out)


def test_loss_scatter_and_gif(tmp_path):
    from raw2logit_tpu.evaluation.figures import loss_scatter, make_stage_gif
    from raw2logit_tpu.tracking.images import save_image_grid
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    with open(os.path.join(run_dir, "metrics.jsonl"), "w") as fh:
        for e in range(3):
            fh.write(json.dumps({"step": e, "train_loss": 1.0 / (e + 1)}) + "\n")
            fh.write(json.dumps({"step": e, "val_loss": 1.1 / (e + 1)}) + "\n")
    assert os.path.exists(loss_scatter(run_dir))

    rng = np.random.default_rng(0)
    for e in (1, 2):
        d = os.path.join(run_dir, "results", f"epoch_{e:04d}")
        os.makedirs(d)
        save_image_grid(rng.uniform(size=(2, 16, 16, 3)),
                        os.path.join(d, "img_processing_0_gamma_correct.png"))
    out = make_stage_gif(run_dir, stage="gamma_correct", mode="processing")
    assert out.endswith(".gif") and os.path.exists(out)
