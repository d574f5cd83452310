"""Per-stage image / gradient / diff tracking.

Functional equivalent of TrackImagesCallback + track_images + log_tensor
(model.py:154-301): for a tracking subset, save each processing stage as a
tensor (.npy) and a PNG grid, plus per-stage input-gradients of the task
loss (via taps — see isp/__init__ docstring) and stage diffs against a
reference processor (adversarial drift visualization, model.py:249-252).
"""

import os
from collections import defaultdict
import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

# pipeline order of the stage-tracking protocol (reference
# figures/figures.py:25); jit outputs carry dicts in sorted-key order, so
# artifact numbering must re-impose this
STAGE_ORDER = ("demosaic", "color_correct", "sharpening", "gaussian",
               "clipped", "gamma_correct", "noise", "rgb")


def save_image_grid(batch, path, nrow=8):
    """(B, H, W, C) or (B, H, W) -> one PNG grid (torchvision make_grid
    equivalent, model.py:199-200), normalizing like save_image does not:
    values are clipped to [0, 1]."""
    x = np.asarray(batch, dtype=np.float32)
    if x.ndim == 3:
        x = x[..., None]
    b, h, w, c = x.shape
    ncol = min(nrow, b)
    nr = (b + ncol - 1) // ncol
    pad = 2
    grid = np.zeros((nr * (h + pad) + pad, ncol * (w + pad) + pad, c),
                    np.float32)
    for i in range(b):
        r, col = divmod(i, ncol)
        grid[pad + r * (h + pad): pad + r * (h + pad) + h,
             pad + col * (w + pad): pad + col * (w + pad) + w] = x[i]
    grid = np.clip(grid, 0.0, 1.0)
    if c == 1:
        grid = grid[..., 0]
    Image.fromarray((grid * 255).astype(np.uint8)).save(path)


def log_tensor(batch, path, save_tensors=True, nrow=8):
    """Save tensor + PNG grid (model.py:190-201)."""
    if save_tensors:
        np.save(path, np.asarray(batch))
    img_path = path.replace(".npy", ".png")
    split = img_path.split("/")
    img_path = "/".join(split[:-1]) + "/img_" + split[-1]
    save_image_grid(batch, img_path, nrow=nrow)


def make_stage_gradients_fn(processor, classifier, loss_fn,
                            with_reference=False, with_logits=False):
    """ONE jitted program per tracked batch: stages + per-stage loss
    gradients via zero-valued taps (replaces retain_grad,
    pipeline_torch.py:219-221), optionally reference-processor stages and
    the logits (from the same forward the grad uses — no extra pass).
    Eager apply/grad here would pay a remote compile per op on the TPU
    backend (CLAUDE.md)."""

    @jax.jit
    def fn(variables, clf_variables, ref_variables, raw, labels):
        _, stages = processor.apply(variables, raw, train=False)
        taps0 = {k: jnp.zeros_like(v) for k, v in stages.items()}

        def _loss(taps):
            rgb, stg = processor.apply(variables, raw, train=False,
                                       taps=taps)
            logits = classifier.apply(clf_variables, rgb, train=False)
            squeezed = logits
            if logits.ndim == 4 and logits.shape[-1] == 1:
                squeezed = logits[..., 0]
            return loss_fn(squeezed, labels), logits

        grads, logits = jax.grad(_loss, has_aux=True)(taps0)
        ref_stages = {}
        if with_reference:
            _, ref_stages = processor.apply(ref_variables, raw,
                                            train=False)
        return stages, grads, (logits if with_logits else None), ref_stages

    return fn


def stage_gradients(processor, variables, classifier, clf_variables,
                    loss_fn, raw, labels):
    """Gradient of the task loss w.r.t. every processing stage.

    Returns (stages, grads): two dicts of (B, H, W, C) arrays."""
    fn = make_stage_gradients_fn(processor, classifier, loss_fn)
    stages, grads, _, _ = fn(variables, clf_variables, variables, raw,
                             labels)
    return stages, grads


def track_images(processor, variables, classifier, clf_variables, loss_fn,
                 loader, reference_variables=None, track_processing=True,
                 track_gradients=True, track_predictions=True,
                 save_tensors=True, save_loc="results"):
    """Dump stage tensors/PNGs, stage gradients, and diffs vs a reference
    processor for every batch in ``loader`` (model.py:204-301)."""
    os.makedirs(save_loc, exist_ok=True)

    stages_full = defaultdict(list)
    grads_full = defaultdict(list)
    diffs_full = defaultdict(list)
    labels_full, logits_full = [], []

    track_differences = reference_variables is not None
    batch_fn = make_stage_gradients_fn(processor, classifier, loss_fn,
                                       with_reference=track_differences,
                                       with_logits=track_predictions)

    for raw, labels in loader:
        raw = jnp.asarray(raw)
        stages, grads, logits, ref_stages = batch_fn(
            variables, clf_variables,
            reference_variables if track_differences else variables,
            raw, jnp.asarray(labels))
        if not stages:
            return  # static / none pipeline: nothing to track

        if track_predictions:
            labels_full.append(np.asarray(labels))
            logits_full.append(np.asarray(logits))

        for name, batch in stages.items():
            stages_full[name].append(np.asarray(batch))
            if track_differences:
                diffs_full[name].append(
                    np.asarray(ref_stages[name]) - np.asarray(batch))
            if track_gradients:
                grads_full[name].append(np.asarray(grads[name]))

    ordered = ([n for n in STAGE_ORDER if n in stages_full]
               + [n for n in stages_full if n not in STAGE_ORDER])
    for stage_nr, name in enumerate(ordered):
        if track_processing:
            batch = np.concatenate(stages_full[name])
            log_tensor(batch, os.path.join(
                save_loc, f"processing_{stage_nr}_{name}.npy"), save_tensors)
        if track_differences:
            batch = np.concatenate(diffs_full[name])
            log_tensor(batch, os.path.join(
                save_loc, f"diffs_{stage_nr}_{name}.npy"), False)
        if track_gradients:
            g = np.abs(np.concatenate(grads_full[name]))
            rng = g.max() - g.min()
            g = (g - g.min()) / (rng if rng > 0 else 1.0)
            log_tensor(g, os.path.join(
                save_loc, f"gradients_{stage_nr}_{name}.npy"), save_tensors)

    if track_predictions and labels_full:
        labels = np.concatenate(labels_full)
        logits = np.concatenate(logits_full)
        if labels.ndim >= 3:  # segmentation masks
            log_tensor(labels[..., None] if labels.ndim == 3 else labels,
                       os.path.join(save_loc, "targets.npy"), save_tensors)
            log_tensor(logits, os.path.join(save_loc, "preds.npy"),
                       save_tensors)
        else:
            np.save(os.path.join(save_loc, "targets.npy"), labels)
            np.save(os.path.join(save_loc, "preds.npy"), logits)
