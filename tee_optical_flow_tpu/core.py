"""Clip-shape bucketing: bound jit recompiles over ragged DICOM cohorts.

DICOM clips vary in (N, H, W) per file (reference
calculate_optical_flow.py:478-538 processes whatever shape each file
holds), and every distinct shape recompiles every jitted stage — ~67 s
for the fused TV-L1 kernel alone, ~90 s for a cold clip (NOTES.md). A
heterogeneous cohort pays that per shape; SURVEY §7 calls this out as a
hard part ("ragged clip shapes ... bucketing/padding policies").

Policy (config knobs on ``OpticalFlowCalculationConfig``):

- **Frame axis**: pad N up to a multiple of ``frame_bucket`` by
  repeating the last frame. This is *exact* for every real frame:
  per-frame stages (Otsu, SAM inference, morphology) are independent
  along N; the temporal moving-average mask extends the clip with
  last-frame duplicates anyway (ops/morphology.py:127), so appended
  duplicates reproduce its boundary handling bit-for-bit; and flow
  pairs are batch-independent, the padded (last, last) pairs simply
  being sliced off. Cost: up to ``frame_bucket - 1`` wasted pair
  solves (~0.05 s each at 480x640) against ~90 s saved per avoided
  recompile.

- **Spatial axes**: pad H/W up to multiples of ``spatial_bucket`` with
  edge replication, *for the flow solver only* (compute_clip_flow),
  slicing the padding off the returned flow. Replicated borders carry
  zero image gradient, so the data term is inert in the padding and
  the smoothness term diffuses the boundary flow outward; the solve is
  equal to the unpadded one away from the padded edge (the same ~8 px
  band the EPE contract already excludes, and which the pipeline's
  masked analysis never consumes). Mask stages run at native (H, W):
  Otsu's histogram and the segmentor's 1024^2 resize are
  shape-semantic, and their per-shape compiles are cheap relative to
  the solver's.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from .utils.helpers import pad_to_multiple

__all__ = [
    "bucketed_frame_count", "bucketed_spatial", "enable_compilation_cache",
    "pad_clip_frames", "pad_spatial_edge", "pad_to_multiple",
]


def enable_compilation_cache(cache_dir: str,
                             min_compile_time_secs: float = 1.0) -> bool:
    """Persist compiled XLA executables under ``cache_dir`` so every CLI
    process after the first skips the big compiles (~67-90 s for the
    fused TV-L1 solver per shape bucket, NOTES.md). Bucketing (this
    module) bounds recompiles *within* a process; the persistent cache
    removes them *across* processes — together a production cohort pays
    each solver compile once per machine, not once per run.

    Wired from ``DeviceConfig.compilation_cache_dir`` (cli/process
    --compilation_cache_dir / --config). Returns False (with a warning)
    if the backend rejects the cache instead of failing the run.
    """
    import logging

    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_time_secs)
        return True
    except Exception as exc:  # pragma: no cover - backend-dependent
        logging.getLogger(__name__).warning(
            "persistent compilation cache disabled (%r)", exc)
        return False


def bucketed_frame_count(n: int, frame_bucket: int) -> int:
    """Padded clip length: next multiple of ``frame_bucket`` (>= n)."""
    return pad_to_multiple(n, frame_bucket)


def bucketed_spatial(h: int, w: int, spatial_bucket: int) -> Tuple[int, int]:
    """Padded (H, W): next multiples of ``spatial_bucket``."""
    return (pad_to_multiple(h, spatial_bucket),
            pad_to_multiple(w, spatial_bucket))


def pad_clip_frames(clip: np.ndarray, n_target: int) -> np.ndarray:
    """Pad a (N, ...) clip to ``n_target`` frames by repeating the last
    frame (host-side; exact under slicing, see module docstring)."""
    n = clip.shape[0]
    if n_target <= n:
        return clip
    reps = np.repeat(clip[-1:], n_target - n, axis=0)
    return np.concatenate([clip, reps], axis=0)


def pad_spatial_edge(images, h_target: int, w_target: int):
    """Edge-replicate pad (..., H, W) device images on the bottom/right to
    (h_target, w_target); no-op when already at target."""
    import jax.numpy as jnp

    h, w = images.shape[-2], images.shape[-1]
    ph, pw = h_target - h, w_target - w
    if ph == 0 and pw == 0:
        return images
    pad = [(0, 0)] * (images.ndim - 2) + [(0, ph), (0, pw)]
    return jnp.pad(images, pad, mode="edge")
