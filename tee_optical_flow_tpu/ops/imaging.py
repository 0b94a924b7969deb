"""Basic image ops on device: grayscale, normalization, resizing.

Replaces the skimage/PIL/torchvision host calls on the reference's hot
paths (rgb2gray at calculate_optical_flow.py:399/586, PIL 1024x1024 resize
+ ImageNet normalize at :47-60) with jit-able jnp, batched over frames.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# host-side constants (a module-scope jnp array would initialize the
# device backend at import time); jnp ops consume them directly

# ITU-R BT.601 luma weights, matching skimage.color.rgb2gray
_LUMA = np.asarray([0.2125, 0.7154, 0.0721], dtype=np.float32)

# torchvision ImageNet statistics (reference calculate_optical_flow.py:59)
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], dtype=np.float32)


def rgb2gray(frames: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) uint8/float -> (..., H, W) float32 luma in [0, 1]."""
    frames = jnp.asarray(frames)
    if frames.dtype == jnp.uint8:
        frames = frames.astype(jnp.float32) / 255.0
    else:
        frames = frames.astype(jnp.float32)
    return frames @ _LUMA


def gray_from_clip(clip: jnp.ndarray) -> jnp.ndarray:
    """Luma for a clip that is either (..., H, W, 3) RGB or already a
    single (..., H, W) channel (a grayscale clip uploaded without its two
    redundant RGB copies — the luma weights sum to 1, so rgb2gray of
    R=G=B frames IS the channel)."""
    clip = jnp.asarray(clip)
    if clip.ndim >= 3 and clip.shape[-1] == 3:
        return rgb2gray(clip)
    if clip.dtype == jnp.uint8:
        return clip.astype(jnp.float32) / 255.0
    return clip.astype(jnp.float32)


def img2uint8_jnp(img: jnp.ndarray) -> jnp.ndarray:
    """Min-shift, max-scale to [0, 255] (reference optical_flow_utils.py:30-31
    semantics), kept float32 on device — downstream flow math wants floats,
    and a uint8 round-trip would just cost precision."""
    img = img.astype(jnp.float32)
    shifted = img - jnp.min(img)
    mx = jnp.max(img)
    scaled = jnp.where(mx > 0, shifted / mx, shifted)
    return jnp.clip(scaled, 0.0, 1.0) * 255.0


def normalize_imagenet(frames: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) in [0, 1] -> ImageNet-normalized."""
    return (frames - IMAGENET_MEAN) / IMAGENET_STD


def resize_frames(frames: jnp.ndarray, height: int, width: int,
                  method: str = "bilinear") -> jnp.ndarray:
    """Batched spatial resize of (N, H, W, C) or (N, H, W)."""
    frames = jnp.asarray(frames)
    if frames.ndim == 3:
        shape = (frames.shape[0], height, width)
    else:
        shape = (frames.shape[0], height, width, frames.shape[3])
    return jax.image.resize(frames.astype(jnp.float32), shape, method=method)
