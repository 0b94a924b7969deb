"""Segmentation losses + metrics.

Parity with the reference training recipe
(SingleGPU_train_finetune_noprompt.py:76-77, :113-115): monai
DiceLoss(sigmoid=True, squared_pred=True, to_onehot_y=True, mean) plus
CrossEntropyLoss, and the dice_coeff_multi_class eval metric
(utils/dsc.py:79-92: all classes incl. background, smooth=1, dice per
image then mean). Also the generic loss library surface of
utils/losses.py (per-channel dice, generalized dice, BCE-dice).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dice_loss(logits: jnp.ndarray, labels: jnp.ndarray,
              squared_pred: bool = True, smooth: float = 1e-5) -> jnp.ndarray:
    """monai-style dice: sigmoid on logits, one-hot labels, mean over
    channels and batch. logits (B, C, H, W); labels (B, H, W) int."""
    num_cls = logits.shape[1]
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    onehot = jax.nn.one_hot(labels, num_cls, axis=1, dtype=jnp.float32)
    dims = (2, 3)
    inter = jnp.sum(probs * onehot, axis=dims)
    if squared_pred:
        denom = jnp.sum(probs ** 2, axis=dims) + jnp.sum(onehot ** 2, axis=dims)
    else:
        denom = jnp.sum(probs, axis=dims) + jnp.sum(onehot, axis=dims)
    dice = (2.0 * inter + smooth) / (denom + smooth)
    return jnp.mean(1.0 - dice)


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """torch CrossEntropyLoss semantics (mean over pixels)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    num_cls = logits.shape[1]
    onehot = jax.nn.one_hot(labels, num_cls, axis=1, dtype=jnp.float32)
    return -jnp.mean(jnp.sum(onehot * logp, axis=1))


def combined_loss(logits: jnp.ndarray, labels: jnp.ndarray):
    """dice + CE, returning (total, dice, ce) like the reference logs them."""
    ld = dice_loss(logits, labels)
    lc = cross_entropy_loss(logits, labels)
    return ld + lc, ld, lc


def dice_coeff_multi_class(pred_labels: jnp.ndarray, true_labels: jnp.ndarray,
                           n_classes: int, smooth: float = 1.0) -> jnp.ndarray:
    """Mean dice over all classes of argmax'd predictions
    (reference utils/dsc.py:79-92). pred/true (B, H, W) int."""
    scores = []
    for cls in range(n_classes):
        p = (pred_labels == cls).astype(jnp.float32)
        t = (true_labels == cls).astype(jnp.float32)
        inter = jnp.sum(p * t, axis=(1, 2))
        union = jnp.sum(p, axis=(1, 2)) + jnp.sum(t, axis=(1, 2))
        scores.append((2.0 * inter + smooth) / (union + smooth))
    return jnp.mean(jnp.stack(scores))


def per_class_iou_dice(pred_labels: jnp.ndarray, true_labels: jnp.ndarray,
                       n_classes: int, eps: float = 1e-7):
    """Per-class IoU and Dice for held-out eval
    (reference val_finetune_noprompt.py:89-99). Returns (iou (C,), dice (C,))."""
    ious, dices = [], []
    for cls in range(n_classes):
        p = (pred_labels == cls).astype(jnp.float32)
        t = (true_labels == cls).astype(jnp.float32)
        inter = jnp.sum(p * t)
        union = jnp.sum(p) + jnp.sum(t) - inter
        ious.append(inter / (union + eps))
        dices.append(2 * inter / (jnp.sum(p) + jnp.sum(t) + eps))
    return jnp.stack(ious), jnp.stack(dices)


def generalized_dice_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                          eps: float = 1e-5) -> jnp.ndarray:
    """Class-frequency-weighted dice (reference utils/losses.py
    GeneralizedDiceLoss:131-163)."""
    num_cls = logits.shape[1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
    onehot = jax.nn.one_hot(labels, num_cls, axis=1, dtype=jnp.float32)
    dims = (0, 2, 3)
    w = 1.0 / (jnp.sum(onehot, axis=dims) ** 2 + eps)
    inter = jnp.sum(w * jnp.sum(probs * onehot, axis=dims))
    denom = jnp.sum(w * jnp.sum(probs + onehot, axis=dims))
    return 1.0 - 2.0 * inter / (denom + eps)


def bce_dice_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                  alpha: float = 1.0, beta: float = 1.0) -> jnp.ndarray:
    """BCE + dice combo (reference utils/losses.py BCEDiceLoss:166-177)."""
    num_cls = logits.shape[1]
    onehot = jax.nn.one_hot(labels, num_cls, axis=1, dtype=jnp.float32)
    logits32 = logits.astype(jnp.float32)
    bce = jnp.mean(jnp.maximum(logits32, 0) - logits32 * onehot +
                   jnp.log1p(jnp.exp(-jnp.abs(logits32))))
    return alpha * bce + beta * dice_loss(logits, labels)


def weighted_cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                                eps: float = 1e-7) -> jnp.ndarray:
    """CE weighted by inverse class frequency (reference utils/losses.py
    WeightedCrossEntropyLoss:180-207)."""
    num_cls = logits.shape[1]
    onehot = jax.nn.one_hot(labels, num_cls, axis=1, dtype=jnp.float32)
    freq = jnp.mean(onehot, axis=(0, 2, 3))
    weights = 1.0 / (freq + eps)
    weights = weights / jnp.sum(weights)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    per_class = -jnp.sum(onehot * logp, axis=(0, 2, 3)) / (
        jnp.sum(onehot, axis=(0, 2, 3)) + eps)
    return jnp.sum(weights * per_class)
