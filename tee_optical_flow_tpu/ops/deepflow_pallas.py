"""Pallas TPU kernel: the DeepFlow fixed-point Jacobi solve, VMEM-resident.

The XLA version of ``deepflow._jacobi_sweeps`` streams ~12 (B, H, W)
arrays through HBM on every one of its 25 Jacobi iterations x 3
fixed-point rounds x 5 scales; like the TV-L1 inner loop before it
(ops/tvl1_pallas.py), that traffic — not flops — is the solver's
dominant cost. This kernel DMAs the per-fixed-point constants once per
pair, runs all ``iters`` Jacobi rounds with du/dv resident in VMEM, and
writes the increments back.

Shapes: one whole (padded) image per grid step — at the production
480x640 the full slab set is ~18 MB, far under the 128 MB v5e VMEM
(``fits_vmem_jacobi`` guards the decision; every pyramid level of a
VGA-class solve qualifies, so the tiled/halo machinery tvl1_pallas needs
for its 10x30 iteration reach is unnecessary here).

Semantics: op-for-op the same arithmetic as ``deepflow._jacobi_sweeps``
(same order, same constants), with the XLA reference's boundary
behavior reproduced via clamped rolls:

- ``centered_gradient`` (warp.py:279): replicate borders,
  0.5 * (right - left) / 0.5 * (down-row - up-row);
- edge-averaged smoothness diffusivities over edge-padded (clamped)
  shifts, matching the XLA path's round-4 discretization;
- the matching soft constraint is a compile-time variant (the term only
  exists at the two coarsest pyramid levels).

The temporal/gradient-constancy differences (it, itx, ity) are computed
in XLA where they fuse into the preceding warp stage, exactly like
tvl1_pallas's th/inv_grad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_common import clamped_shifts, pad_to_tpu_tile

# constant slab order; du/dv state lives after the constants
_CONSTS = ("i1wx", "i1wy", "i1wxx", "i1wxy", "i1wyy",
           "it", "itx", "ity", "u0", "v0")
_MATCH = ("um", "vm", "conf")


def _jacobi_kernel(*refs, iters: int, alpha: float, delta: float,
                   gamma: float, beta: float, use_match: bool,
                   height: int, width: int,
                   padded_h: int, padded_w: int):
    n_const = len(_CONSTS) + (len(_MATCH) if use_match else 0)
    hbm_in = refs[:n_const]
    du_out, dv_out = refs[n_const:n_const + 2]
    scratch, sem = refs[n_const + 2:]

    b = pl.program_id(0)
    for i, src in enumerate(hbm_in):
        pltpu.make_async_copy(src.at[b], scratch.at[i], sem.at[i]).start()
    for i, src in enumerate(hbm_in):
        pltpu.make_async_copy(src.at[b], scratch.at[i], sem.at[i]).wait()

    (i1wx, i1wy, i1wxx, i1wxy, i1wyy, it, itx, ity, u0, v0
     ) = (scratch[i] for i in range(len(_CONSTS)))
    if use_match:
        um = scratch[len(_CONSTS)]
        vm = scratch[len(_CONSTS) + 1]
        conf = scratch[len(_CONSTS) + 2]

    s_du = n_const
    s_dv = n_const + 1
    scratch[s_du] = jnp.zeros((padded_h, padded_w), jnp.float32)
    scratch[s_dv] = jnp.zeros((padded_h, padded_w), jnp.float32)

    # clamped single-pixel shifts with the TRUE image bounds (the padded
    # region reads only itself, so junk there never enters valid pixels)
    nxt_row, prv_row, nxt_col, prv_col = clamped_shifts(
        height, width, padded_h, padded_w)

    def robust(x2):
        return 1.0 / (2.0 * jnp.sqrt(x2 + 1e-6))

    def body(_, carry):
        du = scratch[s_du]
        dv = scratch[s_dv]
        r_int = it + i1wx * du + i1wy * dv
        r_gx = itx + i1wxx * du + i1wxy * dv
        r_gy = ity + i1wxy * du + i1wyy * dv
        psi_d = robust(r_int * r_int) * delta
        psi_g = robust(r_gx * r_gx + r_gy * r_gy) * gamma

        a11 = psi_d * i1wx * i1wx + psi_g * (i1wxx * i1wxx + i1wxy * i1wxy)
        a12 = psi_d * i1wx * i1wy + psi_g * (i1wxx * i1wxy + i1wxy * i1wyy)
        a22 = psi_d * i1wy * i1wy + psi_g * (i1wxy * i1wxy + i1wyy * i1wyy)
        b1 = -(psi_d * i1wx * it + psi_g * (i1wxx * itx + i1wxy * ity))
        b2 = -(psi_d * i1wy * it + psi_g * (i1wxy * itx + i1wyy * ity))

        # smoothness weights: psi' of the flow-gradient magnitude at the
        # current increment (centered differences, replicate borders),
        # then EDGE-AVERAGED diffusivities for div(psi' grad w) — same
        # arithmetic (and order) as deepflow._jacobi_sweeps (round 4)
        uu = u0 + du
        vv = v0 + dv
        ux = 0.5 * (nxt_col(uu) - prv_col(uu))
        uy = 0.5 * (nxt_row(uu) - prv_row(uu))
        vx = 0.5 * (nxt_col(vv) - prv_col(vv))
        vy = 0.5 * (nxt_row(vv) - prv_row(vv))
        w = robust(ux * ux + uy * uy + vx * vx + vy * vy) * alpha

        wn = 0.5 * (w + prv_row(w))
        ws = 0.5 * (w + nxt_row(w))
        ww = 0.5 * (w + prv_col(w))
        we = 0.5 * (w + nxt_col(w))
        wsum = wn + ws + ww + we
        su = (wn * prv_row(uu) + ws * nxt_row(uu) +
              ww * prv_col(uu) + we * nxt_col(uu) - wsum * u0)
        sv = (wn * prv_row(vv) + ws * nxt_row(vv) +
              ww * prv_col(vv) + we * nxt_col(vv) - wsum * v0)

        if use_match:
            ru = u0 + du - um
            rv = v0 + dv - vm
            a_m = beta * conf * robust(ru * ru + rv * rv)
            a11_f = a11 + a_m
            a22_f = a22 + a_m
            b1_f = b1 + a_m * (um - u0)
            b2_f = b2 + a_m * (vm - v0)
        else:
            a11_f, a22_f, b1_f, b2_f = a11, a22, b1, b2

        denom = (a11_f + wsum) * (a22_f + wsum) - a12 * a12
        denom = jnp.where(jnp.abs(denom) > 1e-6, denom, 1e-6)
        rhs1 = b1_f + su
        rhs2 = b2_f + sv
        du_new = ((a22_f + wsum) * rhs1 - a12 * rhs2) / denom
        dv_new = ((a11_f + wsum) * rhs2 - a12 * rhs1) / denom
        scratch[s_du] = 0.5 * (du + du_new)
        scratch[s_dv] = 0.5 * (dv + dv_new)
        return carry

    lax.fori_loop(0, iters, body, 0, unroll=False)

    c1 = pltpu.make_async_copy(scratch.at[s_du], du_out.at[b], sem.at[0])
    c2 = pltpu.make_async_copy(scratch.at[s_dv], dv_out.at[b], sem.at[1])
    c1.start()
    c2.start()
    c1.wait()
    c2.wait()


@functools.partial(
    jax.jit,
    static_argnames=("iters", "alpha", "delta", "gamma", "beta",
                     "interpret"))
def jacobi_sweeps_pallas(i1wx, i1wy, i1wxx, i1wxy, i1wyy, it, itx, ity,
                         u0, v0, match=None, *, iters: int, alpha: float,
                         delta: float, gamma: float, beta: float = 0.0,
                         interpret: bool = False):
    """VMEM-resident twin of deepflow._jacobi_sweeps' Jacobi loop.

    All inputs (B, H, W) float32; ``match`` is an optional (um, vm, conf)
    triple. Returns (du, dv). ``interpret=True`` runs through the Pallas
    interpreter for CPU CI parity tests."""
    b, h, w = u0.shape
    use_match = match is not None
    padded_h, padded_w = pad_to_tpu_tile(h, w)

    def pad(x):
        return jnp.pad(x.astype(jnp.float32),
                       ((0, 0), (0, padded_h - h), (0, padded_w - w)))

    inputs = [pad(x) for x in
              (i1wx, i1wy, i1wxx, i1wxy, i1wyy, it, itx, ity, u0, v0)]
    if use_match:
        inputs.extend(pad(x) for x in match)
    n_const = len(inputs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_const,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        scratch_shapes=[
            pltpu.VMEM((n_const + 2, padded_h, padded_w), jnp.float32),
            pltpu.SemaphoreType.DMA((n_const + 2,)),
        ],
    )

    kernel = functools.partial(
        _jacobi_kernel, iters=iters, alpha=alpha, delta=delta, gamma=gamma,
        beta=beta, use_match=use_match, height=h, width=w,
        padded_h=padded_h, padded_w=padded_w)

    du, dv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, padded_h, padded_w),
                                        jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)

    return du[:, :h, :w], dv[:, :h, :w]


def fits_vmem_jacobi(h: int, w: int,
                     budget_bytes: int = 40 * 1024 * 1024) -> bool:
    """Whether the whole-image Jacobi kernel fits comfortably in VMEM
    (15 resident slabs + iteration temporaries ~2x headroom)."""
    padded_h, padded_w = pad_to_tpu_tile(h, w)
    return 15 * padded_h * padded_w * 4 * 2 <= budget_bytes
