"""Otsu thresholding on device (skimage.filters.threshold_otsu semantics:
256 bins over [min, max], maximize inter-class variance, return the bin
center). Used by the no-SAM mask path (reference predict_movie_thres,
calculate_optical_flow.py:184-213)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("nbins",))
def threshold_otsu(image: jnp.ndarray, nbins: int = 256) -> jnp.ndarray:
    """Scalar Otsu threshold of one image (any shape)."""
    x = image.astype(jnp.float32).ravel()
    lo = jnp.min(x)
    hi = jnp.max(x)
    span = jnp.maximum(hi - lo, 1e-12)
    bucket = jnp.clip(((x - lo) / span * nbins).astype(jnp.int32), 0, nbins - 1)
    hist = jnp.zeros(nbins, jnp.float32).at[bucket].add(1.0)
    centers = lo + (jnp.arange(nbins, dtype=jnp.float32) + 0.5) * span / nbins

    w1 = jnp.cumsum(hist)
    w2 = w1[-1] - w1
    s1 = jnp.cumsum(hist * centers)
    mu1 = s1 / jnp.maximum(w1, 1e-12)
    mu2 = (s1[-1] - s1) / jnp.maximum(w2, 1e-12)
    variance12 = w1 * w2 * (mu1 - mu2) ** 2
    # exclude the final bin (one class would be empty)
    variance12 = variance12.at[-1].set(-1.0)
    idx = jnp.argmax(variance12)
    return centers[idx]


@functools.partial(jax.jit, static_argnames=("nbins",))
def otsu_mask_stack(frames: jnp.ndarray, nbins: int = 256) -> jnp.ndarray:
    """Per-frame Otsu binarization of a (N, H, W) grayscale clip."""
    def one(frame):
        return frame > threshold_otsu(frame, nbins=nbins)
    return jax.vmap(one)(frames)
