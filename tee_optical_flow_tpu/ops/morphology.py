"""Binary morphology as jit-able device programs.

The reference leans on scipy/skimage C internals per frame in Python loops
(binary_fill_holes + remove_small_objects at calculate_optical_flow.py:165
and :206, regionprops centroids/areas at analysis.py:39-86 and
cardiac_cycle_detection.py:161-172). Here every op is expressed over the
whole clip at once:

  * connected components by iterative min-label propagation with pointer
    jumping (``ids = min(ids, ids[ids])``), converging in O(log diameter)
    sweeps — each sweep is a cheap stencil + gather, batched over frames;
  * component sizes/centroids via scatter-adds keyed by root label;
  * fill-holes as border-reachability on the complement;
  * the temporal moving-average mask as a cumsum (reference :90-111).

Connectivity conventions match the reference's defaults: ``label`` uses
8-connectivity (skimage 2-D default), ``remove_small_objects`` and
``binary_fill_holes`` use 4-connectivity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _neighbor_min(ids: jnp.ndarray, big: int, connectivity: int) -> jnp.ndarray:
    """Min of each pixel's neighborhood labels (cross or 3x3)."""
    p = jnp.pad(ids, 1, constant_values=big)
    up = p[:-2, 1:-1]
    down = p[2:, 1:-1]
    left = p[1:-1, :-2]
    right = p[1:-1, 2:]
    m = jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right))
    if connectivity == 2:
        ul = p[:-2, :-2]
        ur = p[:-2, 2:]
        dl = p[2:, :-2]
        dr = p[2:, 2:]
        m = jnp.minimum(m, jnp.minimum(jnp.minimum(ul, ur), jnp.minimum(dl, dr)))
    return jnp.minimum(ids, m)


@functools.partial(jax.jit, static_argnames=("connectivity",))
def connected_components(mask: jnp.ndarray, connectivity: int = 2) -> jnp.ndarray:
    """Label a (H, W) boolean mask.

    Returns int32 (H, W): for foreground pixels, the linear index of the
    component's root (its first pixel in scan order); background pixels
    hold ``H*W``. Root labels are stable identifiers, not dense ranks —
    downstream ops key scatter-adds by them directly, so densification
    (which would force a host sync) is never needed.

    Implementation note (learned the hard way): an earlier version used
    per-round pointer jumping (``ids[ids]``) under a convergence
    while_loop. The gather made each round ~100x more expensive than a
    stencil on TPU, and on full-resolution masks the data-dependent loop
    ran long enough to kill the tunneled TPU worker. Pure neighbor-min
    sweeps with a fixed geometric round bound are dramatically cheaper
    per round and fully static: labels propagate one pixel per round, so
    ``2*(H+W)`` rounds cover any component whose geodesic diameter is
    O(H+W) — true for anatomical masks (a worst-case space-filling
    serpentine would need more; no such mask survives the pipeline's
    fill/remove cleanup).

    Second negative result (round 3): a segmented-min associative_scan
    variant (labels cross a whole straight run per pass, convergence in
    a handful of rounds) measured 2.7x SLOWER than this stencil on the
    chip at (33, 480, 640) — per-round scan cost dwarfs the round-count
    win; XLA pipelines the fixed fori_loop stencil at the VPU ceiling.
    Worse, wrapping it in an early-exit ``lax.while_loop`` under the
    frame-axis vmap over-merged distinct components on TPU at batch 33
    (correct on CPU and at batch 4 — same program). Keep this kernel a
    fixed-bound fori_loop; do not add data-dependent early exits under
    vmap.
    """
    mask = mask.astype(bool)
    h, w = mask.shape
    big = h * w
    lin = jnp.arange(big, dtype=jnp.int32).reshape(h, w)
    ids0 = jnp.where(mask, lin, big)

    def step(_, ids):
        return jnp.where(mask, _neighbor_min(ids, big, connectivity), big)

    rounds = 2 * (h + w)
    return lax.fori_loop(0, rounds, step, ids0)


def component_sizes(ids: jnp.ndarray) -> jnp.ndarray:
    """Pixel count per root label; shape (H*W + 1,), slot -1 = background."""
    h, w = ids.shape
    big = h * w
    flat = ids.ravel()
    return jnp.zeros(big + 1, jnp.int32).at[flat].add(1)


@functools.partial(jax.jit, static_argnames=("min_size", "connectivity"))
def remove_small_objects(mask: jnp.ndarray, min_size: int = 64,
                         connectivity: int = 1) -> jnp.ndarray:
    """Drop components smaller than ``min_size`` pixels (skimage semantics:
    strictly-smaller components are removed)."""
    ids = connected_components(mask, connectivity=connectivity)
    sizes = component_sizes(ids)
    return mask.astype(bool) & (sizes[ids] >= min_size)


@functools.partial(jax.jit, static_argnames=())
def binary_fill_holes(mask: jnp.ndarray) -> jnp.ndarray:
    """Fill background regions not reachable from the border (scipy
    default cross structuring element = 4-connectivity)."""
    mask = mask.astype(bool)
    h, w = mask.shape
    big = h * w
    comp = connected_components(~mask, connectivity=1)
    border = jnp.zeros((h, w), bool).at[0, :].set(True).at[-1, :].set(True) \
        .at[:, 0].set(True).at[:, -1].set(True)
    outside_roots = jnp.where(border & ~mask, comp, big).ravel()
    outside = jnp.zeros(big + 1, bool).at[outside_roots].set(True)
    # background slot must not leak "outside" onto foreground lookups
    outside = outside.at[big].set(False)
    reachable = outside[comp]
    return mask | (~mask & ~reachable)


def moving_avg_mask(arr: jnp.ndarray, n: int = 4, threshold: float = 0.49) -> jnp.ndarray:
    """Temporal moving-average binarization over the frame axis.

    Exact translation of the reference's padding + cumsum-window trick
    (calculate_optical_flow.py:90-111): prepend the first frame once,
    append the last frame twice, window-``n`` mean, threshold.
    """
    arr = jnp.asarray(arr)
    ext = jnp.concatenate([arr[:1], arr, arr[-1:], arr[-1:]], axis=0).astype(jnp.float32)
    csum = jnp.cumsum(ext, axis=0)
    windowed = csum[n - 1:] - jnp.concatenate(
        [jnp.zeros_like(csum[:1]), csum[:-n]], axis=0)
    return (windowed / n) > threshold


@functools.partial(jax.jit, static_argnames=("min_size",))
def clean_binary_stack(mask_stack: jnp.ndarray, min_size: int = 500) -> jnp.ndarray:
    """fill_holes + remove_small_objects per frame, batched over the clip
    (reference clean_mask inner loop, calculate_optical_flow.py:163-167)."""
    def one(frame):
        return remove_small_objects(binary_fill_holes(frame), min_size=min_size,
                                    connectivity=1)
    return jax.vmap(one)(mask_stack.astype(bool))


def component_areas_and_centroids(mask: jnp.ndarray):
    """(area, centroid_row, centroid_col, valid) of the *largest* component
    (reference find_correct_centroid, analysis.py:18-36).

    ``valid`` is False for an empty mask; callers apply the reference's
    carry-forward policy on host.
    """
    mask = mask.astype(bool)
    h, w = mask.shape
    big = h * w
    ids = connected_components(mask, connectivity=2)
    sizes = component_sizes(ids).at[big].set(0)
    root = jnp.argmax(sizes)
    area = sizes[root]
    sel = (ids == root) & mask
    cnt = jnp.maximum(jnp.sum(sel), 1)
    rows = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cols = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    crow = jnp.sum(jnp.where(sel, rows, 0.0)) / cnt
    ccol = jnp.sum(jnp.where(sel, cols, 0.0)) / cnt
    return area, crow, ccol, jnp.any(mask)


def label_first_area(mask: jnp.ndarray):
    """Area of the component containing the first foreground pixel in scan
    order — i.e. skimage label 1, whose area the reference's AreaDetector
    reads via ``props[0].area`` (cardiac_cycle_detection.py:161-172).
    Returns (area, valid)."""
    mask = mask.astype(bool)
    h, w = mask.shape
    big = h * w
    ids = connected_components(mask, connectivity=2)
    first_root = jnp.min(ids)  # smallest root label == first-scanned component
    sizes = component_sizes(ids)
    area = jnp.where(first_root < big, sizes[jnp.clip(first_root, 0, big)], 0)
    return area, jnp.any(mask)


@jax.jit
def largest_centroid_series(mask_stack: jnp.ndarray):
    """Per-frame largest-component centroids over a (N, H, W) stack.
    Returns (centroids (N, 2), areas (N,), valid (N,))."""
    def one(frame):
        area, crow, ccol, valid = component_areas_and_centroids(frame)
        return jnp.stack([crow, ccol]), area, valid
    return jax.vmap(one)(mask_stack)


@jax.jit
def first_area_series(mask_stack: jnp.ndarray):
    """Per-frame skimage-label-1 areas over a (N, H, W) stack."""
    return jax.vmap(label_first_area)(mask_stack)


@jax.jit
def pack_mask_bits(mask: jnp.ndarray) -> jnp.ndarray:
    """Flatten a boolean array and pack 8 pixels/byte (big-endian bit
    order, numpy-compatible). Downloading packed masks moves 8x fewer
    bytes over the device link; pair with :func:`unpack_mask_bits`."""
    return jnp.packbits(mask.astype(bool).ravel())


def unpack_mask_bits(packed, shape) -> np.ndarray:
    """Host-side inverse of :func:`pack_mask_bits` -> bool ndarray."""
    flat = np.unpackbits(np.asarray(packed), count=int(np.prod(shape)))
    return flat.astype(bool).reshape(shape)
