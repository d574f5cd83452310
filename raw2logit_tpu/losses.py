"""Losses, regularizers, metrics.

Parity targets:
  * CrossEntropyLoss (train.py:232)
  * smp DiceLoss(mode='binary', from_logits=True) (train.py:236)
  * WeightedLoss / AuxLoss / l2_regularization (utils/base.py:342-371);
    fixes the reference's AuxLoss bug of reading an attribute that is
    never set (utils/base.py:357)
  * accuracy / IoU metrics (train.py:233,237)
"""

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from raw2logit_tpu.ops.ssim import ssim


def cross_entropy_loss(logits, labels):
    """Mean softmax cross-entropy with integer labels (torch CE semantics)."""
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels).mean()


def dice_loss(logits, targets, smooth=0.0, eps=1e-7):
    """Binary soft-Dice on logits — exact smp DiceLoss(mode='binary',
    from_logits=True) semantics: ONE dice score over batch+spatial
    jointly (dims=(0, 2) of the (B, 1, B*H*W) view), and the loss is
    zeroed when the whole batch's target is empty (smp's mask =
    y_true.sum(dims) > 0 — no gradient pushing everything to zero on
    empty batches)."""
    probs = jax.nn.sigmoid(logits).reshape(-1)
    targets = targets.reshape(-1).astype(probs.dtype)
    intersection = jnp.sum(probs * targets)
    cardinality = jnp.sum(probs + targets)
    score = (2.0 * intersection + smooth) / \
        jnp.maximum(cardinality + smooth, eps)
    has_target = (jnp.sum(targets) > 0).astype(probs.dtype)
    return (1.0 - score) * has_target


def l2_regularization(x, y):
    """Sum of squared differences (utils/base.py:342-343)."""
    return jnp.sum((x - y) ** 2)


def weighted_loss(loss_fn: Callable, weight: float = 1.0) -> Callable:
    """WeightedLoss wrapper (utils/base.py:361-371); weight=-1 turns a task
    loss into the adversarial maximization objective (train.py:266)."""
    def _fn(*args, **kwargs):
        return weight * loss_fn(*args, **kwargs)
    return _fn


def aux_loss(regularization: str, weight: float = 1.0) -> Callable:
    """AuxLoss (utils/base.py:346-358), functional: compare the adversarial
    processor's RGB output against the frozen default processor's output.

    regularization: 'l2' -> sum of squared diffs; 'ssim' -> differentiable
    SSIM (the reference registers SSIM as the *similarity*, so minimizing
    weight * SSIM(x_ref, x_adv) drives the outputs APART; weight balances
    against the negated task loss).
    """
    if regularization == "l2":
        reg = l2_regularization
    elif regularization == "ssim":
        reg = ssim
    else:
        raise NotImplementedError(regularization)

    def _fn(x_reference, x_processed):
        return weight * reg(jax.lax.stop_gradient(x_reference), x_processed)
    return _fn


# --- metrics -------------------------------------------------------------

def accuracy(logits_or_preds, labels):
    """Classification accuracy; accepts logits (B, C) or integer preds."""
    if logits_or_preds.ndim > labels.ndim:
        preds = jnp.argmax(logits_or_preds, axis=-1)
    else:
        preds = logits_or_preds
    return jnp.mean((preds == labels).astype(jnp.float32))


def iou_score(logits_or_probs, targets, threshold=0.5, eps=1e-7,
              from_logits=False):
    """Binary IoU: threshold then intersection/union over the whole batch.

    Deliberate deviation: the reference's smp.utils.metrics.IoU() is
    constructed with activation=None (train.py:237) and so thresholds RAW
    LOGITS at 0.5 (predicted-positive iff prob > 0.622) — an apparent
    activation oversight. Here probabilities are thresholded at 0.5, the
    standard metric; reported IoU therefore differs slightly from the
    reference's logged values for pixels with prob in (0.5, 0.622)."""
    probs = jax.nn.sigmoid(logits_or_probs) if from_logits else logits_or_probs
    preds = (probs > threshold).astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    if preds.ndim == targets.ndim + 1 and preds.shape[-1] == 1:
        preds = preds[..., 0]
    intersection = jnp.sum(preds * targets)
    union = jnp.sum(preds) + jnp.sum(targets) - intersection
    return (intersection + eps) / (union + eps)
