"""Warping, stencils, and pyramid primitives for variational optical flow.

These are the building blocks of the TV-L1 / DeepFlow solvers (replacing
OpenCV's C++ internals behind cv2.optflow.createOptFlow_DualTVL1,
reference calculate_optical_flow.py:577-578). Everything is batched over
the leading (pair) axis and jit-able with static shapes.

Conventions:
  * images are (B, H, W) float32;
  * flow is (u, v) = (column/x displacement, row/y displacement), matching
    OpenCV's output layout flow[..., 0] = dx, flow[..., 1] = dy;
  * gradients use centered differences with replicated (Neumann) borders;
  * divergence is the negative adjoint of the forward-difference gradient,
    the standard discretization of the primal-dual TV solver.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax


def bilinear_warp(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Sample img at (x + u, y + v) with bilinear interpolation, clamping
    coordinates to the border (replicate). img/u/v: (B, H, W)."""
    b, h, w = img.shape
    ys = lax.broadcasted_iota(jnp.float32, (b, h, w), 1) + v
    xs = lax.broadcasted_iota(jnp.float32, (b, h, w), 2) + u
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)

    def gather(yy, xx):
        flat = img.reshape(b, h * w)
        idx = yy * w + xx
        return jnp.take_along_axis(flat, idx.reshape(b, h * w), axis=1).reshape(b, h, w)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def centered_gradient(img: jnp.ndarray):
    """(dx, dy) via centered differences, replicate borders. img: (B, H, W)."""
    px = jnp.pad(img, ((0, 0), (0, 0), (1, 1)), mode="edge")
    py = jnp.pad(img, ((0, 0), (1, 1), (0, 0)), mode="edge")
    dx = 0.5 * (px[:, :, 2:] - px[:, :, :-2])
    dy = 0.5 * (py[:, 2:, :] - py[:, :-2, :])
    return dx, dy


def forward_diff(f: jnp.ndarray):
    """Forward differences with zero at the far border (TV discretization)."""
    dx = jnp.concatenate([f[:, :, 1:] - f[:, :, :-1],
                          jnp.zeros_like(f[:, :, :1])], axis=2)
    dy = jnp.concatenate([f[:, 1:, :] - f[:, :-1, :],
                          jnp.zeros_like(f[:, :1, :])], axis=1)
    return dx, dy


def divergence(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """div(p) = backward-diff_x(p1) + backward-diff_y(p2), the negative
    adjoint of forward_diff."""
    d1 = jnp.concatenate([p1[:, :, :1],
                          p1[:, :, 1:-1] - p1[:, :, :-2],
                          -p1[:, :, -2:-1]], axis=2)
    d2 = jnp.concatenate([p2[:, :1, :],
                          p2[:, 1:-1, :] - p2[:, :-2, :],
                          -p2[:, -2:-1, :]], axis=1)
    return d1 + d2


@functools.lru_cache(maxsize=16)
def _gaussian_kernel(sigma: float, radius: int):
    # cached as host numpy (a cached jnp array would leak tracers across jits)
    import numpy as np

    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    return k.astype(np.float32)


def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable gaussian with replicate borders. img: (B, H, W)."""
    if sigma <= 0:
        return img
    radius = max(1, int(math.ceil(3.0 * sigma)))
    k = _gaussian_kernel(float(sigma), radius)

    # horizontal then vertical 1-D convolutions, via padded dots
    ph = jnp.pad(img, ((0, 0), (0, 0), (radius, radius)), mode="edge")
    out = jnp.zeros_like(img)
    for i in range(2 * radius + 1):
        out = out + k[i] * ph[:, :, i:i + img.shape[2]]
    pv = jnp.pad(out, ((0, 0), (radius, radius), (0, 0)), mode="edge")
    out2 = jnp.zeros_like(img)
    for i in range(2 * radius + 1):
        out2 = out2 + k[i] * pv[:, i:i + img.shape[1], :]
    return out2


def resize_bilinear(img: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, H, W) -> (B, h, w)."""
    return jax.image.resize(img, (img.shape[0], h, w), method="bilinear")


def pyramid_shapes(h: int, w: int, nscales: int, zoom: float, min_size: int = 16):
    """Static per-level (H, W) list, finest first. Levels are dropped once
    either side would fall below ``min_size`` (OpenCV does the same)."""
    shapes = [(h, w)]
    for _ in range(1, nscales):
        nh = int(round(shapes[-1][0] * zoom))
        nw = int(round(shapes[-1][1] * zoom))
        if nh < min_size or nw < min_size:
            break
        shapes.append((nh, nw))
    return shapes


def build_pyramid(img: jnp.ndarray, shapes, blur_sigma: float = 0.8):
    """Gaussian-blur + downsample chain; returns list finest-first."""
    levels = [img]
    for (h, w) in shapes[1:]:
        prev = levels[-1]
        smoothed = gaussian_blur(prev, blur_sigma)
        levels.append(resize_bilinear(smoothed, h, w))
    return levels


def median_filter_3x3(f: jnp.ndarray) -> jnp.ndarray:
    """3x3 median via a stacked sort (replicate borders)."""
    p = jnp.pad(f, ((0, 0), (1, 1), (1, 1)), mode="edge")
    h, w = f.shape[1], f.shape[2]
    taps = [p[:, dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)]
    stacked = jnp.stack(taps, axis=-1)
    return jnp.median(stacked, axis=-1)


def median_filter_5x5(f: jnp.ndarray) -> jnp.ndarray:
    """5x5 median (OpenCV DualTVL1 medianFiltering=5 default)."""
    p = jnp.pad(f, ((0, 0), (2, 2), (2, 2)), mode="edge")
    h, w = f.shape[1], f.shape[2]
    taps = [p[:, dy:dy + h, dx:dx + w] for dy in range(5) for dx in range(5)]
    stacked = jnp.stack(taps, axis=-1)
    return jnp.median(stacked, axis=-1)
