"""Held-out evaluation: per-class IoU + Dice.

Parity with reference finetune-SAM/val_finetune_noprompt.py:38-113
(argmax prediction :80, per-class IoU :89-94, per-class Dice :96-99),
batched on device.
"""

from __future__ import annotations

import logging
from typing import Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from .losses import per_class_iou_dice

logger = logging.getLogger(__name__)


def evaluate_model(model, variables, batches: Iterable, num_cls: int,
                   verbose: bool = True) -> Dict[str, np.ndarray]:
    """Run eval over (images, labels) batches; returns mean per-class
    iou/dice arrays of shape (num_cls,)."""

    @jax.jit
    def step(images, labels):
        logits, _ = model.apply(variables, images, multimask_output=True,
                                train=False)
        pred = jnp.argmax(logits, axis=1)
        return per_class_iou_dice(pred, labels, num_cls)

    iou_sum = np.zeros(num_cls)
    dice_sum = np.zeros(num_cls)
    n = 0
    for images, labels in batches:
        iou, dice = step(jnp.asarray(images), jnp.asarray(labels))
        iou_sum += np.asarray(iou)
        dice_sum += np.asarray(dice)
        n += 1
    result = {"iou": iou_sum / max(n, 1), "dice": dice_sum / max(n, 1)}
    if verbose:
        for c in range(num_cls):
            logger.info("class %d: IoU %.4f Dice %.4f",
                        c, result["iou"][c], result["dice"][c])
    return result
