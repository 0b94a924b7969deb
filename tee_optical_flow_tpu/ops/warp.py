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


def _hat_weight(t: jnp.ndarray) -> jnp.ndarray:
    """Bilinear hat kernel: w(t) = max(0, 1 - |t|), support (-1, 1)."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _catmull_rom_weight(t: jnp.ndarray) -> jnp.ndarray:
    """Catmull-Rom cubic-convolution kernel (Keys, a = -0.5) — the exact
    kernel of the IPOL reference's bicubic_interpolation.c (see
    ops/tvl1_oracle._cubic). Support (-2, 2); partition of unity, so the
    shift-sum formulation stays an exact interpolator. Weights go
    negative on the outer lobes — fine for a weighted sum of shifts."""
    a = jnp.abs(t)
    w_inner = ((1.5 * a - 2.5) * a) * a + 1.0          # |t| <= 1
    w_outer = ((-0.5 * a + 2.5) * a - 4.0) * a + 2.0   # 1 < |t| < 2
    return jnp.where(a <= 1.0, w_inner,
                     jnp.where(a < 2.0, w_outer, 0.0))


def _kernel_taps(kernel: str, r: int):
    """(weight_fn, extra) for a shift-sum warp whose displacement (or
    residual) magnitude is bounded by ~r: taps must cover every integer
    offset where the kernel is nonzero, i.e. r + support/2 on each side."""
    if kernel == "bilinear":
        return _hat_weight, 0
    if kernel == "bicubic":
        return _catmull_rom_weight, 1
    raise ValueError(f"unknown warp kernel {kernel!r}")


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


def bilinear_warp_shift(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                        max_disp: int = 8) -> jnp.ndarray:
    """Gather-free bilinear warp for displacement-bounded flow.

    TPU gathers are slow (measured ~200 ms for a (16, 480, 640) warp vs
    ~5 ms for this formulation); instead the sample is assembled as a sum
    of statically shifted copies weighted by the bilinear hat
    w(k) = relu(1 - |u - kx|) * relu(1 - |v - ky|), which is exact for
    |u|, |v| <= max_disp. Displacements are clamped to that box — the
    coarse-to-fine pyramid keeps per-level motion small, so the default
    bound of 8 px/level covers > 25 px of end-to-end motion at 5 levels.
    Out-of-image samples replicate the border like the gather variant.
    """
    b, h, w = img.shape
    r = int(max_disp)
    lim = float(r) - 1e-3
    u = jnp.clip(u, -lim, lim)
    v = jnp.clip(v, -lim, lim)

    return warp_many_shift((img,), u, v, max_disp=max_disp)[0]


def warp_many_shift(imgs, u: jnp.ndarray, v: jnp.ndarray,
                    max_disp: int = 8, kernel: str = "bilinear"):
    """Shift-based warp of several images by the same flow, sharing the
    interpolation weights. The row-offset loop is rolled (lax.fori_loop
    with dynamic slices) so peak memory stays at a few row-slabs instead
    of (2r+1)^2 materialized shift terms; the column offsets unroll into
    one fused FMA chain per row offset.

    ``kernel`` picks the interpolator: "bilinear" (hat weights, the fast
    default) or "bicubic" (Catmull-Rom — the IPOL/OpenCV reference's
    warp interpolation; one extra tap per side, ~25% more FMAs)."""
    b, h, w = imgs[0].shape
    r = int(max_disp)
    weight, extra = _kernel_taps(kernel, r)
    pad = r + extra
    lim = float(r) - 1e-3
    u = jnp.clip(u, -lim, lim)
    v = jnp.clip(v, -lim, lim)

    padded = [jnp.pad(img, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
              for img in imgs]

    def body(k, acc):
        ky = k - pad
        wy = weight(v - ky.astype(jnp.float32))
        slabs = [lax.dynamic_slice(p, (0, k, 0), (b, h, w + 2 * pad))
                 for p in padded]
        # separable accumulation: sum the row interpolation first, apply
        # wy once per row offset (saves the per-term wy*wx product)
        partial = [jnp.zeros((b, h, w), imgs[0].dtype) for _ in imgs]
        for kx in range(-pad, pad + 1):
            wx = weight(u - kx)
            for i, slab in enumerate(slabs):
                partial[i] = partial[i] + wx * slab[:, :, pad + kx:pad + kx + w]
        return tuple(a + wy * pl_ for a, pl_ in zip(acc, partial))

    init = tuple(jnp.zeros((b, h, w), imgs[0].dtype) for _ in imgs)
    return lax.fori_loop(0, 2 * pad + 1, body, init)


def warp_many_shift_tiled(imgs, u: jnp.ndarray, v: jnp.ndarray,
                          max_disp: int = 16, local_r: int = 8,
                          tile_h: int = 32):
    """Tiled shift-warp: per row-tile the flow is decomposed into an
    integer base offset (applied by one dynamic slice of the padded image)
    plus a small residual covered by the hat-sum.

    The dense hat-sum needs (2*max_disp+1)^2 terms; TV-regularized flow is
    smooth, so within a ``tile_h``-row tile the displacement *range* is
    small and (2*local_r+2)^2 residual terms suffice — ~4x fewer FMAs at
    max_disp=16. Exact when each tile's displacement range fits inside
    [-local_r, local_r] around the tile median (residuals are clamped
    otherwise, which also bounds worst-case behavior).
    """
    b, h, w = imgs[0].shape
    r = int(max_disp)
    lr = int(local_r)
    lim = float(r) - 1e-3
    u = jnp.clip(u, -lim, lim)
    v = jnp.clip(v, -lim, lim)

    n_tiles = -(-h // tile_h)
    padded_h = n_tiles * tile_h
    margin = lr + 1
    pad = r + margin
    padded = [jnp.pad(img, ((0, 0), (pad, pad + padded_h - h), (pad, pad)),
                      mode="edge") for img in imgs]
    if padded_h != h:
        u = jnp.pad(u, ((0, 0), (0, padded_h - h), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, padded_h - h), (0, 0)))

    u_t = u.reshape(b, n_tiles, tile_h, w)
    v_t = v.reshape(b, n_tiles, tile_h, w)
    t0s = jnp.arange(n_tiles, dtype=jnp.int32) * tile_h

    slab_rows = tile_h + 2 * margin
    slab_cols = w + 2 * margin

    def one_tile(padded_b, t0, ut, vt):
        bx = jnp.clip(jnp.floor((jnp.min(ut) + jnp.max(ut)) * 0.5),
                      -r, r).astype(jnp.int32)
        by = jnp.clip(jnp.floor((jnp.min(vt) + jnp.max(vt)) * 0.5),
                      -r, r).astype(jnp.int32)
        rlim = float(lr) + 1.0 - 1e-3
        ru = jnp.clip(ut - bx.astype(jnp.float32), -float(lr), rlim)
        rv = jnp.clip(vt - by.astype(jnp.float32), -float(lr), rlim)

        slabs = [lax.dynamic_slice(
            p_img, (t0 + pad + by - margin, pad + bx - margin),
            (slab_rows, slab_cols)) for p_img in padded_b]

        outs = [jnp.zeros((tile_h, w), imgs[0].dtype) for _ in imgs]
        # hoist the column hat weights (shared by every row offset), and
        # accumulate each row interpolation before the single wy scale
        wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(ru - kx))
               for kx in range(-lr, lr + 2)]
        for ky in range(-lr, lr + 2):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(rv - ky))
            rowacc = [jnp.zeros((tile_h, w), imgs[0].dtype) for _ in imgs]
            for j, kx in enumerate(range(-lr, lr + 2)):
                for i, slab in enumerate(slabs):
                    rowacc[i] = rowacc[i] + wxs[j] * slab[
                        margin + ky:margin + ky + tile_h,
                        margin + kx:margin + kx + w]
            for i in range(len(imgs)):
                outs[i] = outs[i] + wy * rowacc[i]
        return tuple(outs)

    per_b = jax.vmap(one_tile, in_axes=(None, 0, 0, 0))
    over_b = jax.vmap(per_b, in_axes=(0, None, 0, 0))
    tiled = over_b(padded, t0s, u_t, v_t)  # each (B, T, tile_h, w)
    return tuple(t.reshape(b, padded_h, w)[:, :h, :] for t in tiled)


def warp_many_shift_tiled2d(imgs, u: jnp.ndarray, v: jnp.ndarray,
                            max_disp: int = 16, local_r: int = 8,
                            tile_h: int = None, tile_w: int = None,
                            kernel: str = "bilinear"):
    """2-D tiled shift-warp: like ``warp_many_shift_tiled`` but with the
    integer base offset chosen per (tile_h x tile_w) tile instead of per
    full-width row band. The base then tracks *local* motion in both
    axes, so flow that sweeps more than ``local_r`` px across the image
    width (e.g. radial contraction: u spans +-c*W/2 over a row) stays
    within the residual radius where the row-band decomposition clamps.
    Residuals outside [-local_r, local_r+1) are still clamped, bounding
    worst-case behavior at sharp motion boundaries.

    Note: radii below ~8 are NOT safe inside the TV-L1 solver even at the
    finest level — the solver's intermediate flow (pre-median outliers,
    border drift) exceeds small radii and the clamp corrupts the solve
    (measured round 2). Keep local_r >= the row-band radius.
    """
    b, h, w = imgs[0].shape
    # default geometry: quarter-height x half-width tiles (rounded to the
    # 8/32 layout grain). Measured fastest at 480x640 (4x2 tiles, zero
    # column padding at both tiled pyramid levels), and the per-tile flow
    # span stays well inside the radius for physiologic TEE motion.
    if tile_h is None:
        tile_h = -(-(-(-h // 4)) // 8) * 8
    if tile_w is None:
        tile_w = -(-(-(-w // 2)) // 32) * 32
    r = int(max_disp)
    lr = int(local_r)
    weight, extra = _kernel_taps(kernel, lr)
    lim = float(r) - 1e-3
    u = jnp.clip(u, -lim, lim)
    v = jnp.clip(v, -lim, lim)

    nty = -(-h // tile_h)
    ntx = -(-w // tile_w)
    ph_, pw_ = nty * tile_h, ntx * tile_w
    margin = lr + 1 + extra
    pad = r + margin
    padded = [jnp.pad(img, ((0, 0), (pad, pad + ph_ - h), (pad, pad + pw_ - w)),
                      mode="edge") for img in imgs]
    if ph_ != h or pw_ != w:
        u = jnp.pad(u, ((0, 0), (0, ph_ - h), (0, pw_ - w)))
        v = jnp.pad(v, ((0, 0), (0, ph_ - h), (0, pw_ - w)))

    # (B, nty, ntx, tile_h, tile_w)
    u_t = u.reshape(b, nty, tile_h, ntx, tile_w).transpose(0, 1, 3, 2, 4)
    v_t = v.reshape(b, nty, tile_h, ntx, tile_w).transpose(0, 1, 3, 2, 4)
    ty0 = jnp.arange(nty, dtype=jnp.int32) * tile_h
    tx0 = jnp.arange(ntx, dtype=jnp.int32) * tile_w

    slab_rows = tile_h + 2 * margin
    slab_cols = tile_w + 2 * margin

    def one_tile(padded_b, y0, x0, ut, vt):
        bx = jnp.clip(jnp.floor((jnp.min(ut) + jnp.max(ut)) * 0.5),
                      -r, r).astype(jnp.int32)
        by = jnp.clip(jnp.floor((jnp.min(vt) + jnp.max(vt)) * 0.5),
                      -r, r).astype(jnp.int32)
        rlim = float(lr) + 1.0 - 1e-3
        ru = jnp.clip(ut - bx.astype(jnp.float32), -float(lr), rlim)
        rv = jnp.clip(vt - by.astype(jnp.float32), -float(lr), rlim)

        slabs = [lax.dynamic_slice(
            p_img, (y0 + pad + by - margin, x0 + pad + bx - margin),
            (slab_rows, slab_cols)) for p_img in padded_b]

        outs = [jnp.zeros((tile_h, tile_w), imgs[0].dtype) for _ in imgs]
        taps = range(-lr - extra, lr + 2 + extra)
        wxs = [weight(ru - kx) for kx in taps]
        for ky in taps:
            wy = weight(rv - ky)
            rowacc = [jnp.zeros((tile_h, tile_w), imgs[0].dtype)
                      for _ in imgs]
            for j, kx in enumerate(taps):
                for i, slab in enumerate(slabs):
                    rowacc[i] = rowacc[i] + wxs[j] * slab[
                        margin + ky:margin + ky + tile_h,
                        margin + kx:margin + kx + tile_w]
            for i in range(len(imgs)):
                outs[i] = outs[i] + wy * rowacc[i]
        return tuple(outs)

    per_x = jax.vmap(one_tile, in_axes=(None, None, 0, 0, 0))
    per_y = jax.vmap(per_x, in_axes=(None, 0, None, 0, 0))
    over_b = jax.vmap(per_y, in_axes=(0, None, None, 0, 0))
    tiled = over_b(padded, ty0, tx0, u_t, v_t)  # each (B, nty, ntx, th, tw)
    return tuple(
        t.transpose(0, 1, 3, 2, 4).reshape(b, ph_, pw_)[:, :h, :w]
        for t in tiled)


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


def resize_cubic(img: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, H, W) -> (B, h, w) with the Keys a=-0.5 cubic (Catmull-Rom
    family — the kernel of the IPOL reference's bicubic zoom)."""
    return jax.image.resize(img, (img.shape[0], h, w), method="cubic")


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


@functools.lru_cache(maxsize=8)
def _median_network(n: int):
    """Compare-exchange sequence computing the median of n values: a
    Batcher odd-even mergesort network pruned backward to the exchanges
    that can influence the middle output wire. Host-side, cached, static.
    For n=25 this cuts ~300 sort exchanges to ~100."""
    pairs = []

    def oddeven_merge(lo, hi, step):
        s2 = step * 2
        if s2 < hi - lo:
            oddeven_merge(lo, hi, s2)
            oddeven_merge(lo + step, hi, s2)
            for i in range(lo + step, hi - step, s2):
                pairs.append((i, i + step))
        else:
            pairs.append((lo, lo + step))

    def oddeven_sort(lo, hi):
        if hi - lo >= 1:
            mid = lo + (hi - lo) // 2
            oddeven_sort(lo, mid)
            oddeven_sort(mid + 1, hi)
            oddeven_merge(lo, hi, 1)

    # Batcher networks need power-of-two width; pad with +inf wires that
    # sort to the top and shift the median index accordingly
    width = 1
    while width < n:
        width *= 2
    oddeven_sort(0, width - 1)
    # +inf pads sort to the top wires, so the median of the n real values
    # lands on sorted wire (n-1)//2
    target = (n - 1) // 2

    # prune backward: keep exchanges that can affect the target wire
    needed = {target}
    kept = []
    for (i, j) in reversed(pairs):
        if i in needed or j in needed:
            kept.append((i, j))
            needed.add(i)
            needed.add(j)
    kept.reverse()
    return tuple(kept), width


def median_of_taps(taps) -> jnp.ndarray:
    """Exact median of a list of equal-shaped arrays via a pruned
    compare-exchange network (no generic sort)."""
    n = len(taps)
    network, width = _median_network(n)
    wires = list(taps) + [jnp.full_like(taps[0], jnp.inf)] * (width - n)
    for (i, j) in network:
        lo = jnp.minimum(wires[i], wires[j])
        hi = jnp.maximum(wires[i], wires[j])
        wires[i] = lo
        wires[j] = hi
    return wires[(n - 1) // 2]


def median_filter_3x3(f: jnp.ndarray) -> jnp.ndarray:
    """3x3 median via a stacked sort (replicate borders)."""
    p = jnp.pad(f, ((0, 0), (1, 1), (1, 1)), mode="edge")
    h, w = f.shape[1], f.shape[2]
    taps = [p[:, dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)]
    stacked = jnp.stack(taps, axis=-1)
    return jnp.median(stacked, axis=-1)


# Optimal 9-comparator sort-5 network (verified exhaustively over all
# 2^5 binary inputs — 0/1 principle — in test_tvl1).
SORT5_NETWORK = ((0, 1), (3, 4), (2, 4), (2, 3), (0, 3),
                 (0, 2), (1, 4), (1, 3), (1, 2))

# Rank-12 (the median) of 25 values given as 5 PRE-SORTED columns of 5
# (wire c*5+p = position p, ascending, of column c). 66 compare-exchanges;
# the answer lands on wire COLUMN_MEDIAN_25_TARGET. Derived by building a
# balanced Batcher odd-even merge tree over the sorted columns, pruning
# comparators that never swap on any valid input / don't feed the median
# wire (to fixpoint), then greedy single-deletion peephole minimization —
# every step re-verified exhaustively over all 6^5 = 7776 valid
# sorted-column 0/1 patterns, which by the (restricted) 0/1 principle
# proves correctness for all real inputs with sorted columns
# (test_tvl1 re-runs that exhaustive verification). Column sortedness is
# what the 5x5 median filter gets for free by sorting the 5 vertical-
# shift PLANES once (9 CEs, shared by all 5 horizontal taps): total
# 9 + 66 = 75 CEs/pixel vs 153 for the from-scratch pruned network.
COLUMN_MEDIAN_25_NETWORK = (
    (0, 5), (4, 9), (4, 5), (2, 7), (2, 4), (7, 5), (1, 6), (3, 8),
    (3, 6), (1, 2), (3, 4), (6, 7), (8, 5), (10, 15), (14, 19), (14, 15),
    (12, 17), (12, 14), (17, 15), (11, 16), (13, 18), (13, 16), (11, 12),
    (13, 14), (16, 17), (18, 15), (0, 10), (5, 15), (5, 10), (4, 14),
    (4, 5), (14, 10), (2, 12), (7, 17), (7, 12), (7, 5), (12, 14),
    (1, 11), (9, 19), (9, 11), (6, 16), (6, 9), (16, 11), (3, 13),
    (8, 18), (8, 13), (8, 9), (13, 16), (8, 5), (9, 12), (13, 14),
    (10, 20), (5, 10), (14, 24), (14, 10), (15, 22), (12, 15), (12, 14),
    (11, 21), (9, 11), (16, 11), (19, 23), (13, 19), (8, 13), (13, 16),
    (13, 14))
COLUMN_MEDIAN_25_TARGET = 14


def median_from_sorted_columns(wires) -> jnp.ndarray:
    """Median of 25 equal-shaped arrays laid out as 5 sorted columns
    (wires[c*5 + p], ascending in p) via COLUMN_MEDIAN_25_NETWORK."""
    wires = list(wires)
    for (i, j) in COLUMN_MEDIAN_25_NETWORK:
        lo = jnp.minimum(wires[i], wires[j])
        hi = jnp.maximum(wires[i], wires[j])
        wires[i] = lo
        wires[j] = hi
    return wires[COLUMN_MEDIAN_25_TARGET]


def median_filter_5x5(f: jnp.ndarray) -> jnp.ndarray:
    """5x5 median (OpenCV DualTVL1 medianFiltering=5 default), exact.

    Column-sharing construction: the 5 vertical-shift planes are sorted
    ONCE with the 9-CE sort-5 network — every pixel's 5 horizontally-
    neighboring window columns are then shifted reads of those sorted
    planes — and the median of the 25 is selected by the 66-CE pruned
    merge network. 75 CEs/pixel vs 153 for the from-scratch pruned
    selection network (~2x fewer VPU min/max ops; bit-identical output)."""
    n, h, w = f.shape
    pv = jnp.pad(f, ((0, 0), (2, 2), (0, 0)), mode="edge")
    planes = [pv[:, dy:dy + h, :] for dy in range(5)]
    for (i, j) in SORT5_NETWORK:
        lo = jnp.minimum(planes[i], planes[j])
        hi = jnp.maximum(planes[i], planes[j])
        planes[i] = lo
        planes[j] = hi
    padded = [jnp.pad(p, ((0, 0), (0, 0), (2, 2)), mode="edge")
              for p in planes]
    wires = [padded[p][:, :, dx:dx + w]
             for dx in range(5) for p in range(5)]
    return median_from_sorted_columns(wires)
