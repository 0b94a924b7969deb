"""Static fine-grained saliency (center-surround), batched on device.

Replaces cv2.saliency.StaticSaliencyFineGrained (reference
calculate_optical_flow.py:559-560, :585-586), which computes on/off
center-surround differences over box surrounds of increasing size
(Montabone & Soto 2010). Box means are exact via 2-D cumulative sums
(integral images); the on/off channels are summed over scales and
min-max normalized to [0, 1] like OpenCV's output.

Bounded divergence from OpenCV's exact pixel values is expected and
acceptable: saliency is an optional preprocessing choice for the flow
input (the default pipeline path is ``no_saliency``).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp


def _box_mean(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Exact box mean over (2r+1)^2 windows with edge-replicated padding.
    img: (B, H, W)."""
    b, h, w = img.shape
    p = jnp.pad(img, ((0, 0), (radius + 1, radius), (radius + 1, radius)),
                mode="edge")
    ii = jnp.cumsum(jnp.cumsum(p, axis=1), axis=2)
    k = 2 * radius + 1
    s = (ii[:, k:, k:] - ii[:, :-k, k:] - ii[:, k:, :-k] + ii[:, :-k, :-k])
    return s / float(k * k)


@functools.partial(jax.jit, static_argnames=("radii",))
def fine_grained_saliency(frames: jnp.ndarray,
                          radii: Sequence[int] = (2, 4, 8, 16)) -> jnp.ndarray:
    """(B, H, W) grayscale in any range -> (B, H, W) saliency in [0, 1]."""
    img = frames.astype(jnp.float32)
    on = jnp.zeros_like(img)
    off = jnp.zeros_like(img)
    for r in radii:
        surround = _box_mean(img, r)
        on = on + jnp.maximum(img - surround, 0.0)
        off = off + jnp.maximum(surround - img, 0.0)
    sal = on + off
    flat = sal.reshape(sal.shape[0], -1)
    lo = jnp.min(flat, axis=1)[:, None, None]
    hi = jnp.max(flat, axis=1)[:, None, None]
    return (sal - lo) / jnp.maximum(hi - lo, 1e-12)
