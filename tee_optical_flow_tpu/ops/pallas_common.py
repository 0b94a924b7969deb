"""Shared pieces of the TPU Pallas kernels (tvl1_pallas, deepflow_pallas).

Three things every kernel here needs and must agree on:

- whether the Pallas path may run at all (``on_tpu_backend``) — the
  kernels use pltpu primitives that only lower on the TPU backend, so
  every ``use_pallas`` flag is ANDed with this (config.py promises the
  flags are "ignored off-TPU");
- the (8, 128) sublane/lane padding of an (H, W) image
  (``pad_to_tpu_tile``);
- clamped single-pixel shifts with the TRUE image bounds
  (``clamped_shifts``): edge-replicate neighbor access on a padded VMEM
  slab, where the padded region reads only itself so junk there never
  enters valid pixels. Built on ``pltpu.roll`` (shifts must be >= 0:
  a "+1" shift is rolled by dim-1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.pallas import tpu as pltpu


def on_tpu_backend() -> bool:
    """True when the default backend can lower pltpu kernels."""
    return jax.default_backend() == "tpu"


def pad_to_tpu_tile(h: int, w: int) -> tuple:
    """Round (H, W) up to the float32 (8, 128) sublane/lane tiling."""
    return -(-h // 8) * 8, -(-w // 128) * 128


def clamped_shifts(height: int, width: int, padded_h: int, padded_w: int):
    """Edge-replicate neighbor reads on a (padded_h, padded_w) VMEM array
    whose valid region is (height, width). Returns
    (nxt_row, prv_row, nxt_col, prv_col):

      nxt_row(f)[y, x] == f[min(y+1, height-1), x]
      prv_row(f)[y, x] == f[max(y-1, 0), x]         (columns analogous)
    """
    rows = lax.broadcasted_iota(jnp.int32, (padded_h, padded_w), 0)
    cols = lax.broadcasted_iota(jnp.int32, (padded_h, padded_w), 1)
    first_row = rows == 0
    first_col = cols == 0
    row_hi = rows >= (height - 1)
    col_hi = cols >= (width - 1)

    def nxt_row(f):
        return jnp.where(row_hi, f, pltpu.roll(f, padded_h - 1, 0))

    def prv_row(f):
        return jnp.where(first_row, f, pltpu.roll(f, 1, 0))

    def nxt_col(f):
        return jnp.where(col_hi, f, pltpu.roll(f, padded_w - 1, 1))

    def prv_col(f):
        return jnp.where(first_col, f, pltpu.roll(f, 1, 1))

    return nxt_row, prv_row, nxt_col, prv_col
