"""Pallas TPU kernel: the TV-L1 primal-dual inner loop, VMEM-resident.

The XLA version of the inner loop streams ~16 (B, H, W) arrays through HBM
every iteration; at 10x30 iterations x 5 warps x 5 scales that is the
solver's dominant cost. This kernel runs a whole block of inner iterations
with all state in VMEM: per grid step it DMAs a row slab of the six state
fields (u, v, p11, p12, p21, p22) plus five per-warp constants
(rho_c, i1wx, i1wy, th = lambda*theta*grad, inv_grad) into scratch,
iterates ``n_iters`` times on chip, and writes back the slab center.

The derived constants th/inv_grad are computed once per warp in XLA (they
fuse into the warp stage) rather than inside the kernel: keeping only the
five truly-needed read-only slabs — and updating the six state slabs in
place instead of carrying SSA copies through the loop — roughly halves the
kernel's VMEM footprint, which is what admits tile_h=256 (1.25x halo
recompute) over the previous tile_h=128 (1.5x).

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

from .pallas_common import clamped_shifts, pad_to_tpu_tile

_N_CONST = 5   # rho_c, i1wx, i1wy, th, inv_grad
_N_STATE = 6   # u, v, p11, p12, p21, p22


def _make_stencils(dim_h, dim_w, first_row, last_row, first_col, last_col):
    """Forward-difference and divergence stencils on (dim_h, dim_w) VMEM
    arrays via lane/sublane rolls, with the XLA reference ops' boundary
    semantics (warp.forward_diff / warp.divergence) applied through the
    global-coordinate masks."""

    def fdx(f):
        s = pltpu.roll(f, dim_w - 1, 1)  # roll by -1 (shifts must be >= 0)
        return jnp.where(last_col, 0.0, s - f)

    def fdy(f):
        s = pltpu.roll(f, dim_h - 1, 0)
        return jnp.where(last_row, 0.0, s - f)

    def div(p1, p2):
        r1 = pltpu.roll(p1, 1, 1)
        d1 = jnp.where(first_col, p1, jnp.where(last_col, -r1, p1 - r1))
        r2 = pltpu.roll(p2, 1, 0)
        d2 = jnp.where(first_row, p2, jnp.where(last_row, -r2, p2 - r2))
        return d1 + d2

    return fdx, fdy, div


def _make_inner_body(scratch, stencils, *, theta, taut, l_t,
                     err_ref=None, err_thresh=None, err_mask=None):
    """The primal-dual iteration, operating in place on the scratch state
    slabs (indices _N_CONST..) with the per-warp constants at 0.._N_CONST.
    One source of truth for both the tiled and the fused kernel — the
    math must stay bitwise-identical to tvl1.tvl1_inner_block_xla.

    With ``err_ref`` (an SMEM (1,) scalar) the body implements the
    IPOL/OpenCV epsilon early stop (tvl1._tvl1_outer_eps_xla semantics):
    the whole iteration is predicated on err_ref[0] > err_thresh, and the
    sum of squared flow updates over the valid region (``err_mask``) is
    written back each iteration. Once the error drops below the threshold
    every remaining iteration is a predicated no-op."""
    fdx, fdy, div = stencils
    rho_c = scratch[0]
    i1wx = scratch[1]
    i1wy = scratch[2]
    th = scratch[3]
    inv_grad = scratch[4]
    ltx = l_t * i1wx
    lty = l_t * i1wy

    def step():
        # state lives in the scratch slabs and is updated in place; the
        # loop carries nothing (halves live VMEM vs SSA-carried state)
        u_old = scratch[5]
        v_old = scratch[6]
        p11 = scratch[7]
        p12 = scratch[8]
        p21 = scratch[9]
        p22 = scratch[10]
        rho = rho_c + i1wx * u_old + i1wy * v_old
        neg = rho < -th
        pos = rho > th
        rg = rho * inv_grad
        d1 = jnp.where(neg, ltx, jnp.where(pos, -ltx, -rg * i1wx))
        d2 = jnp.where(neg, lty, jnp.where(pos, -lty, -rg * i1wy))
        u = (u_old + d1) + theta * div(p11, p12)
        v = (v_old + d2) + theta * div(p21, p22)
        scratch[5] = u
        scratch[6] = v
        if err_ref is not None:
            # padded rows/cols can hold junk after the on-chip median
            # (clamped shifts pull valid edge values outward), so the
            # error sum must mask to the true image region
            du2 = (u - u_old) * (u - u_old) + (v - v_old) * (v - v_old)
            err_ref[0] = jnp.sum(jnp.where(err_mask, du2, 0.0))
        ux = fdx(u)
        uy = fdy(u)
        vx = fdx(v)
        vy = fdy(v)
        # keep the division form: a reciprocal reassociation measured 0%
        # faster and its ulp-level differences amplify over the 7500
        # iterated applications into visible flow changes at median edges
        ng1 = 1.0 + taut * jnp.sqrt(ux * ux + uy * uy)
        ng2 = 1.0 + taut * jnp.sqrt(vx * vx + vy * vy)
        scratch[7] = (p11 + taut * ux) / ng1
        scratch[8] = (p12 + taut * uy) / ng1
        scratch[9] = (p21 + taut * vx) / ng2
        scratch[10] = (p22 + taut * vy) / ng2

    def inner_body(_, carry):
        if err_ref is None:
            step()
        else:
            pl.when(err_ref[0] > err_thresh)(step)
        return carry

    return inner_body


def _inner_block_kernel(off_ref,  # scalar prefetch: (n_tiles,) global row starts
                        rho_c_hbm, i1wx_hbm, i1wy_hbm, th_hbm, ig_hbm,
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

    # ---- DMA the 11 slabs in ----
    srcs = [rho_c_hbm, i1wx_hbm, i1wy_hbm, th_hbm, ig_hbm,
            u_hbm, v_hbm, p11_hbm, p12_hbm, p21_hbm, p22_hbm]
    for i, src in enumerate(srcs):
        pltpu.make_async_copy(
            src.at[b, pl.ds(row0, slab_h), :],
            scratch.at[i], sem.at[i]).start()
    for i in range(len(srcs)):
        pltpu.make_async_copy(
            srcs[i].at[b, pl.ds(row0, slab_h), :],
            scratch.at[i], sem.at[i]).wait()

    # global coordinates of slab rows (padded row r == global row
    # r + row0 - halo), for boundary masks
    rows = lax.broadcasted_iota(jnp.int32, (slab_h, padded_w), 0) + row0 - halo
    cols = lax.broadcasted_iota(jnp.int32, (slab_h, padded_w), 1)
    stencils = _make_stencils(slab_h, padded_w,
                              rows == 0, rows == (height - 1),
                              cols == 0, cols == (width - 1))
    body = _make_inner_body(scratch, stencils, theta=theta, taut=taut,
                            l_t=l_t)
    lax.fori_loop(0, n_iters, body, 0, unroll=False)

    # ---- write back the valid tile center straight from the state slabs
    # (HBM refs are DMA-only) ----
    # the slab covers global rows [row0 - halo, ...); the tile's first
    # global row (== row0 in global coords since offsets are tile starts)
    # sits at slab row `halo`. Output arrays use global row coords.
    outs = (u_out, v_out, p11_out, p12_out, p21_out, p22_out)
    copies = [
        pltpu.make_async_copy(
            scratch.at[_N_CONST + i, pl.ds(halo, tile_h), :],
            out.at[b, pl.ds(row0, tile_h), :],
            sem.at[i])
        for i, out in enumerate(outs)
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()


def _fused_scale_kernel(rho_c_hbm, i1wx_hbm, i1wy_hbm, th_hbm, ig_hbm,
                        u_hbm, v_hbm, p11_hbm, p12_hbm, p21_hbm, p22_hbm,
                        u_out, v_out, p11_out, p12_out, p21_out, p22_out,
                        scratch, sem, err_smem,
                        *, outer_iters: int, inner_iters: int,
                        use_median: bool, l_t: float, theta: float,
                        taut: float, epsilon: float, height: int, width: int,
                        padded_h: int, padded_w: int):
    """One whole (median + inner-block) x outer_iters outer loop for one
    frame pair, image fully VMEM-resident: the per-warp constants are
    DMA'd once instead of once per outer iteration, and the flow median
    runs on-chip between inner blocks.

    Semantics: bitwise-equal to `outer_iters` x [median_filter_5x5(u, v)
    if use_median] + tvl1_inner_block_xla(n_iters=inner_iters) — the
    median's edge-replication is reproduced with roll+select clamps and
    the identical column-sharing compare-exchange networks
    (warp.SORT5_NETWORK + warp.COLUMN_MEDIAN_25_NETWORK).

    With epsilon > 0 the loop carries the IPOL/OpenCV early-stop error in
    SMEM (``err_smem``): every median and inner iteration is predicated on
    err > epsilon^2 * area, so this pair's remaining iterations become
    ~free scalar-branch no-ops once it converges — the per-pair analogue
    of tvl1._tvl1_outer_eps_xla's masked batch (decisions equal up to
    reduction-order ulps in the error sum).
    """
    from .warp import (
        COLUMN_MEDIAN_25_NETWORK, COLUMN_MEDIAN_25_TARGET, SORT5_NETWORK)

    b = pl.program_id(0)

    srcs = [rho_c_hbm, i1wx_hbm, i1wy_hbm, th_hbm, ig_hbm,
            u_hbm, v_hbm, p11_hbm, p12_hbm, p21_hbm, p22_hbm]
    for i, src in enumerate(srcs):
        pltpu.make_async_copy(src.at[b], scratch.at[i], sem.at[i]).start()
    for i, src in enumerate(srcs):
        pltpu.make_async_copy(src.at[b], scratch.at[i], sem.at[i]).wait()

    rows = lax.broadcasted_iota(jnp.int32, (padded_h, padded_w), 0)
    cols = lax.broadcasted_iota(jnp.int32, (padded_h, padded_w), 1)
    stencils = _make_stencils(padded_h, padded_w,
                              rows == 0, rows == (height - 1),
                              cols == 0, cols == (width - 1))

    # edge-replicated single-pixel shifts (median taps); the padded region
    # is clamped out exactly like the XLA median's edge padding
    # (pallas_common.clamped_shifts — shared with deepflow_pallas)
    up1, down1, right1, left1 = clamped_shifts(
        height, width, padded_h, padded_w)

    def med5(f):
        # column-sharing median (warp.median_filter_5x5, same networks):
        # sort the 5 vertical-shift planes once (9 CEs, shared by all 5
        # horizontal taps), then the 66-CE pruned merge selects rank 12
        # of the 25 — 75 CEs/pixel vs 153 from scratch, bit-identical
        d1 = down1(f)
        u1 = up1(f)
        planes = [down1(d1), d1, f, u1, up1(u1)]
        for (i, j) in SORT5_NETWORK:
            lo = jnp.minimum(planes[i], planes[j])
            hi = jnp.maximum(planes[i], planes[j])
            planes[i] = lo
            planes[j] = hi
        wires = []
        for sp in planes:
            l1 = left1(sp)
            r1 = right1(sp)
            wires.append((left1(l1), l1, sp, r1, right1(r1)))
        # wire c*5+p = sorted position p of window column c
        wires = [wires[p][c] for c in range(5) for p in range(5)]
        for (i, j) in COLUMN_MEDIAN_25_NETWORK:
            lo = jnp.minimum(wires[i], wires[j])
            hi = jnp.maximum(wires[i], wires[j])
            wires[i] = lo
            wires[j] = hi
        return wires[COLUMN_MEDIAN_25_TARGET]

    if epsilon > 0.0:
        err_thresh = jnp.float32(epsilon * epsilon * height * width)
        err_mask = (rows < height) & (cols < width)
        err_smem[0] = jnp.float32(jnp.inf)
        inner_body = _make_inner_body(scratch, stencils, theta=theta,
                                      taut=taut, l_t=l_t, err_ref=err_smem,
                                      err_thresh=err_thresh,
                                      err_mask=err_mask)

        def outer_body(_, carry):
            if use_median:
                @pl.when(err_smem[0] > err_thresh)
                def _():
                    scratch[5] = med5(scratch[5])
                    scratch[6] = med5(scratch[6])
            lax.fori_loop(0, inner_iters, inner_body, 0, unroll=False)
            return carry
    else:
        inner_body = _make_inner_body(scratch, stencils, theta=theta,
                                      taut=taut, l_t=l_t)

        def outer_body(_, carry):
            if use_median:
                scratch[5] = med5(scratch[5])
                scratch[6] = med5(scratch[6])
            lax.fori_loop(0, inner_iters, inner_body, 0, unroll=False)
            return carry

    lax.fori_loop(0, outer_iters, outer_body, 0, unroll=False)

    outs = (u_out, v_out, p11_out, p12_out, p21_out, p22_out)
    copies = [
        pltpu.make_async_copy(scratch.at[_N_CONST + i], out.at[b], sem.at[i])
        for i, out in enumerate(outs)
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()


@functools.partial(
    jax.jit,
    static_argnames=("outer_iters", "inner_iters", "use_median", "l_t",
                     "theta", "taut", "epsilon", "interpret"))
def tvl1_outer_loop_pallas(rho_c, i1wx, i1wy, grad, u, v,
                           p11, p12, p21, p22, *,
                           outer_iters: int, inner_iters: int,
                           use_median: bool, l_t: float, theta: float,
                           taut: float, epsilon: float = 0.0,
                           interpret: bool = False):
    """Run the full per-warp outer loop (5x5 flow median + inner block,
    x outer_iters) in one whole-image-resident kernel. Returns the same
    6-tuple as the per-block path. Use when the image fits VMEM
    (fits_vmem_fused); with epsilon == 0 bitwise-equal to the composed
    XLA/per-block path, with epsilon > 0 each pair early-stops on the
    IPOL/OpenCV criterion (see _fused_scale_kernel).
    """
    b, h, w = u.shape
    grad = grad.astype(jnp.float32)
    th = l_t * grad
    inv_grad = jnp.where(grad > 1e-10, 1.0 / jnp.maximum(grad, 1e-10), 0.0)
    padded_h, padded_w = pad_to_tpu_tile(h, w)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, padded_h - h), (0, padded_w - w)))

    inputs = [pad(x.astype(jnp.float32)) for x in
              (rho_c, i1wx, i1wy, th, inv_grad, u, v, p11, p12, p21, p22)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * (_N_CONST + _N_STATE),
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * _N_STATE,
        scratch_shapes=[
            pltpu.VMEM((_N_CONST + _N_STATE, padded_h, padded_w), jnp.float32),
            pltpu.SemaphoreType.DMA((_N_CONST + _N_STATE,)),
            pltpu.SMEM((1,), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _fused_scale_kernel, outer_iters=outer_iters,
        inner_iters=inner_iters, use_median=use_median, l_t=l_t,
        theta=theta, taut=taut, epsilon=epsilon, height=h, width=w,
        padded_h=padded_h, padded_w=padded_w)

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, padded_h, padded_w),
                                        jnp.float32)] * _N_STATE,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)

    return tuple(o[:, :h, :w] for o in outs)


def fits_vmem_fused(h: int, w: int, budget_bytes: int = 40 * 1024 * 1024) -> bool:
    """Whether the fused whole-image kernel fits comfortably in VMEM
    (11 resident slabs + median/iteration temporaries ~2x headroom)."""
    padded_h, padded_w = pad_to_tpu_tile(h, w)
    return (_N_CONST + _N_STATE) * padded_h * padded_w * 4 * 2 <= budget_bytes


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "l_t", "theta", "taut", "tile_h",
                     "interpret"))
def tvl1_inner_block_pallas(rho_c, i1wx, i1wy, grad, u, v,
                            p11, p12, p21, p22, *,
                            n_iters: int, l_t: float, theta: float,
                            taut: float, tile_h: int = 256,
                            interpret: bool = False):
    """Run ``n_iters`` primal-dual iterations on (B, H, W) state.

    ``interpret=True`` runs the kernel through the Pallas interpreter so
    the halo/mask/boundary logic is testable on the CPU CI mesh."""
    b, h, w = u.shape
    # derived per-warp constants, computed in XLA where they fuse into the
    # preceding warp stage (same math as the XLA twin in ops/tvl1.py)
    grad = grad.astype(jnp.float32)
    th = l_t * grad
    inv_grad = jnp.where(grad > 1e-10, 1.0 / jnp.maximum(grad, 1e-10), 0.0)
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
              (rho_c, i1wx, i1wy, th, inv_grad, u, v, p11, p12, p21, p22)]

    # per-tile slab start rows in padded coords: tile_start (+halo pad
    # offset cancels): slab covers [tile_start, tile_start + slab_h)
    offsets = jnp.asarray([t * tile_h for t in range(n_tiles)], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * (_N_CONST + _N_STATE),
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * _N_STATE,
        scratch_shapes=[
            pltpu.VMEM((_N_CONST + _N_STATE, slab_h, padded_w), jnp.float32),
            pltpu.SemaphoreType.DMA((_N_CONST + _N_STATE,)),
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
                                        jnp.float32)] * _N_STATE,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # v5e has 128 MiB of physical VMEM; the default scoped limit is
            # a conservative 16 MiB. The slab footprint is static and known
            # (11 slabs + iteration temporaries), so let it through.
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(offsets, *inputs)

    # outputs use global row coords; drop the bucket/lane padding
    return tuple(o[:, :h, :w] for o in outs)
