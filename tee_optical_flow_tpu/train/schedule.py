"""LR schedule: linear warmup -> polynomial(0.9) decay.

Parity with the reference's in-loop lr mutation
(SingleGPU_train_finetune_noprompt.py:121-134): lr * (i+1)/warmup during
warmup, then lr * (1 - shift/max_iter)^0.9, expressed as an optax
schedule so the optimizer stays pure.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_poly_schedule(base_lr: float, warmup_period: int,
                         max_iterations: int, power: float = 0.9):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1.0) / max(warmup_period, 1)
        shift = jnp.maximum(step - warmup_period, 0.0)
        denom = max(max_iterations, 1)
        poly = base_lr * jnp.maximum(1.0 - shift / denom, 0.0) ** power
        if warmup_period <= 0:
            return poly
        return jnp.where(step < warmup_period, warm, poly)

    return schedule
