"""Pallas TPU kernel: the TV-L1 primal-dual inner loop, VMEM-resident.

The XLA version of the inner loop streams ~16 (B, H, W) arrays through HBM
every iteration; at 10x30 iterations x 5 warps x 5 scales that is the
solver's dominant cost. This kernel runs a whole block of inner iterations
with all state in VMEM: per grid step it DMAs a row slab of the six state
fields (u, v, p11, p12, p21, p22) plus the four per-warp constants
(rho_c, i1wx, i1wy, grad) into scratch, iterates ``n_iters`` times on
chip, and writes back the slab center.

Correctness with tiling: the stencils (forward difference / divergence)
have 1-pixel reach, so after n iterations a cell depends on values at most
n rows away. Each tile therefore loads a halo of ``n_iters`` rows of the
*pre-iteration* state and recomputes the halo region redundantly — tile
centers are then bitwise-equivalent to an untiled solve. Columns are kept
whole (W stays in-lane); the grid runs over (pair, row-tile).

Boundary handling matches the XLA reference ops (warp.forward_diff /
warp.divergence): forward differences are zero past the last row/column;
divergence uses the standard adjoint edge cases. Masks are built from the
tile's global row offset (scalar-prefetched).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _inner_block_kernel(off_ref,  # scalar prefetch: (n_tiles,) global row starts
                        rho_c_hbm, i1wx_hbm, i1wy_hbm, grad_hbm,
                        u_hbm, v_hbm, p11_hbm, p12_hbm, p21_hbm, p22_hbm,
                        u_out, v_out, p11_out, p12_out, p21_out, p22_out,
                        scratch, sem,
                        *, n_iters: int, l_t: float, theta: float,
                        taut: float, tile_h: int, halo: int,
                        height: int, width: int, padded_w: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    # offsets are tile_h-multiples (tile_h is 8-aligned); tell Mosaic so
    # the dynamic DMA slices provably respect the (8, 128) tiling
    row0 = pl.multiple_of(off_ref[t], 8)
    slab_h = tile_h + 2 * halo

    # ---- DMA the 10 slabs in ----
    srcs = [rho_c_hbm, i1wx_hbm, i1wy_hbm, grad_hbm,
            u_hbm, v_hbm, p11_hbm, p12_hbm, p21_hbm, p22_hbm]
    for i, src in enumerate(srcs):
        pltpu.make_async_copy(
            src.at[b, pl.ds(row0, slab_h), :],
            scratch.at[i], sem.at[i]).start()
    for i in range(len(srcs)):
        pltpu.make_async_copy(
            srcs[i].at[b, pl.ds(row0, slab_h), :],
            scratch.at[i], sem.at[i]).wait()

    rho_c = scratch[0]
    i1wx = scratch[1]
    i1wy = scratch[2]
    grad = scratch[3]

    # global coordinates of slab rows (padded row r == global row
    # r + row0 - halo), for boundary masks
    rows = lax.broadcasted_iota(jnp.int32, (slab_h, padded_w), 0) + row0 - halo
    cols = lax.broadcasted_iota(jnp.int32, (slab_h, padded_w), 1)
    last_row = rows == (height - 1)
    first_row = rows == 0
    last_col = cols == (width - 1)
    first_col = cols == 0

    # loop-invariant precomputation: thresholds, scaled gradients, and the
    # data-step slopes; turns two divisions per iteration into multiplies
    th = l_t * grad
    inv_grad = jnp.where(grad > 1e-10, 1.0 / jnp.maximum(grad, 1e-10), 0.0)
    ltx = l_t * i1wx
    lty = l_t * i1wy
    gx = i1wx * inv_grad
    gy = i1wy * inv_grad

    def fdx(f):
        s = pltpu.roll(f, padded_w - 1, 1)  # roll by -1 (shifts must be >= 0)
        return jnp.where(last_col, 0.0, s - f)

    def fdy(f):
        s = pltpu.roll(f, slab_h - 1, 0)
        return jnp.where(last_row, 0.0, s - f)

    def div(p1, p2):
        r1 = pltpu.roll(p1, 1, 1)
        d1 = jnp.where(first_col, p1, jnp.where(last_col, -r1, p1 - r1))
        r2 = pltpu.roll(p2, 1, 0)
        d2 = jnp.where(first_row, p2, jnp.where(last_row, -r2, p2 - r2))
        return d1 + d2

    def body(_, carry):
        u, v, p11, p12, p21, p22 = carry
        rho = rho_c + i1wx * u + i1wy * v
        neg = rho < -th
        pos = rho > th
        d1 = jnp.where(neg, ltx, jnp.where(pos, -ltx, -rho * gx))
        d2 = jnp.where(neg, lty, jnp.where(pos, -lty, -rho * gy))
        u = (u + d1) + theta * div(p11, p12)
        v = (v + d2) + theta * div(p21, p22)
        ux = fdx(u)
        uy = fdy(u)
        vx = fdx(v)
        vy = fdy(v)
        # keep the division form: a reciprocal reassociation measured 0%
        # faster and its ulp-level differences amplify over the 7500
        # iterated applications into visible flow changes at median edges
        ng1 = 1.0 + taut * jnp.sqrt(ux * ux + uy * uy)
        ng2 = 1.0 + taut * jnp.sqrt(vx * vx + vy * vy)
        p11 = (p11 + taut * ux) / ng1
        p12 = (p12 + taut * uy) / ng1
        p21 = (p21 + taut * vx) / ng2
        p22 = (p22 + taut * vy) / ng2
        return u, v, p11, p12, p21, p22

    state = (scratch[4], scratch[5], scratch[6], scratch[7],
             scratch[8], scratch[9])
    u, v, p11, p12, p21, p22 = lax.fori_loop(0, n_iters, body, state)

    # ---- write back the valid tile center (stage through VMEM scratch,
    # HBM refs are DMA-only) ----
    # the slab covers global rows [row0 - halo, ...); the tile's first
    # global row (== row0 in global coords since offsets are tile starts)
    # sits at slab row `halo`. Output arrays use global row coords.
    results = (u, v, p11, p12, p21, p22)
    outs = (u_out, v_out, p11_out, p12_out, p21_out, p22_out)
    for i, val in enumerate(results):
        scratch[4 + i] = val
    copies = [
        pltpu.make_async_copy(
            scratch.at[4 + i, pl.ds(halo, tile_h), :],
            out.at[b, pl.ds(row0, tile_h), :],
            sem.at[i])
        for i, out in enumerate(outs)
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "l_t", "theta", "taut", "tile_h",
                     "interpret"))
def tvl1_inner_block_pallas(rho_c, i1wx, i1wy, grad, u, v,
                            p11, p12, p21, p22, *,
                            n_iters: int, l_t: float, theta: float,
                            taut: float, tile_h: int = 128,
                            interpret: bool = False):
    """Run ``n_iters`` primal-dual iterations on (B, H, W) state.

    ``interpret=True`` runs the kernel through the Pallas interpreter so
    the halo/mask/boundary logic is testable on the CPU CI mesh."""
    b, h, w = u.shape
    # halo must cover n_iters of 1-px stencil reach; round to the (8, 128)
    # sublane tiling so DMA slices stay aligned
    halo = -(-n_iters // 8) * 8
    # small pyramid levels: a single tile covering the image
    tile_h = min(tile_h, max(8, -(-h // 8) * 8))
    # lane dim must be 128-aligned for Mosaic DMA; pad and mask (the
    # boundary masks use the true width, so padding never propagates in)
    padded_w = -(-w // 128) * 128
    # pad rows so every slab read stays in bounds; padded rows never
    # influence the valid center (masks use global coordinates)
    n_tiles = max(1, -(-h // tile_h))
    padded_h = n_tiles * tile_h
    slab_h = tile_h + 2 * halo

    def pad(x):
        return jnp.pad(x, ((0, 0), (halo, padded_h - h + halo),
                           (0, padded_w - w)))

    inputs = [pad(x.astype(jnp.float32)) for x in
              (rho_c, i1wx, i1wy, grad, u, v, p11, p12, p21, p22)]

    # per-tile slab start rows in padded coords: tile_start (+halo pad
    # offset cancels): slab covers [tile_start, tile_start + slab_h)
    offsets = jnp.asarray([t * tile_h for t in range(n_tiles)], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 10,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 6,
        scratch_shapes=[
            pltpu.VMEM((10, slab_h, padded_w), jnp.float32),
            pltpu.SemaphoreType.DMA((10,)),
        ],
    )

    kernel = functools.partial(
        _inner_block_kernel, n_iters=n_iters, l_t=l_t, theta=theta,
        taut=taut, tile_h=tile_h, halo=halo, height=h, width=w,
        padded_w=padded_w)

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, padded_h, padded_w),
                                        jnp.float32)] * 6,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(offsets, *inputs)

    # outputs use global row coords; drop the bucket/lane padding
    return tuple(o[:, :h, :w] for o in outs)
