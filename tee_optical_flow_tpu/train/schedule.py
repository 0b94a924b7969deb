"""LR schedule + per-layer LR decay: warmup -> poly, TinyViT lr scales.

Parity with the reference's in-loop lr mutation
(SingleGPU_train_finetune_noprompt.py:121-134): lr * (i+1)/warmup during
warmup, then lr * (1 - shift/max_iter)^0.9, expressed as an optax
schedule so the optimizer stays pure.

Layer-wise LR decay mirrors TinyViT.set_layer_lr_decay (reference
tiny_vit_sam.py:655-687, invoked with 0.8 from build_sam.py:77): with
depth = sum(depths), block k gets lr scale decay^(depth-1-k), the patch
embed gets the deepest decay (scale of block 0), each PatchMerging gets
the scale of the last block of its stage, and everything else (the SAM
neck — created *after* the reference sets scales — prompt encoder, mask
decoder) trains at full rate. Implemented as an optax transform that
scales the final updates per parameter path, the pure equivalent of
per-group lr in a torch optimizer.
"""

from __future__ import annotations

import re
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


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


_BLOCK_RE = re.compile(r"stage(\d+)_block(\d+)$")
_MERGE_RE = re.compile(r"merge(\d+)$")


def tinyvit_lr_scale_for_path(path: Tuple, decay: float,
                              depths: Sequence[int] = (2, 2, 6, 2)) -> float:
    """LR scale for one flattened param path (reference semantics above)."""
    depth = sum(depths)
    starts = [0]
    for d in depths:
        starts.append(starts[-1] + d)

    def scale(k: int) -> float:
        return decay ** (depth - 1 - k)

    for entry in path:
        name = getattr(entry, "key", entry)
        name = str(name)
        if name.startswith("patch_embed_conv"):
            return scale(0)
        m = _BLOCK_RE.match(name)
        if m:
            return scale(starts[int(m.group(1))] + int(m.group(2)))
        m = _MERGE_RE.match(name)
        if m:
            return scale(starts[int(m.group(1)) + 1] - 1)
    return 1.0


def layer_lr_decay_transform(decay: float,
                             depths: Sequence[int] = (2, 2, 6, 2)
                             ) -> optax.GradientTransformation:
    """Optax transform scaling updates by the TinyViT per-layer lr scale.

    Chain it *after* the base optimizer so the scale multiplies the whole
    update (including decoupled weight decay), exactly like per-group lr.
    """

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        scaled = jax.tree_util.tree_map_with_path(
            lambda path, u: u * tinyvit_lr_scale_for_path(path, decay, depths),
            updates)
        return scaled, state

    return optax.GradientTransformation(init, update)
