"""Pallas TPU kernel: the DeepFlow fixed-point red-black SOR solve,
VMEM-resident.

The XLA version of ``deepflow._sor_sweeps`` streams ~12 (B, H, W) arrays
through HBM on every sweep of its psi x SOR nesting x 3 fixed-point
rounds x 5 scales; like the TV-L1 inner loop before it
(ops/tvl1_pallas.py), that traffic — not flops — is the solver's
dominant cost. This kernel DMAs the per-fixed-point constants once per
pair, runs the full psi x SOR solve with du/dv and the per-psi
linear-system coefficients resident in VMEM, and writes the increments
back.

Round 5: the damped-Jacobi loop was replaced by lagged-nonlinearity
(psi) recomputes x red-black SOR sweeps with omega=1.6 — the relaxation
OpenCV's own DeepFlow runs and the float64 oracle's exact numerics
(ops/deepflow_oracle.py); the Jacobi solve under-converged the low-data
cavity (sector p95 0.13-0.22 px vs the converged fixed point).

Shapes: one whole (padded) image per grid step — at the production
480x640 the resident slab set (13 constants + 9 per-psi coefficients +
du/dv) is ~30 MB, under the 128 MB v5e VMEM (``fits_vmem_jacobi``
guards the decision; every pyramid level of a VGA-class solve
qualifies, so the tiled/halo machinery tvl1_pallas needs is
unnecessary here).

Semantics: op-for-op the same arithmetic as ``deepflow._sor_sweeps``
(same nesting, order, constants), with the XLA reference's boundary
behavior reproduced via clamped rolls:

- ``centered_gradient`` (warp.py:279): replicate borders,
  0.5 * (right - left) / 0.5 * (down-row - up-row);
- edge-averaged smoothness diffusivities over edge-padded (clamped)
  shifts, matching the XLA path's round-4 discretization;
- red/black checkerboard = (y + x) parity of the TRUE pixel coordinates
  (padding sits at the bottom/right, so parity is unaffected);
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


def _sor_kernel(*refs, psi_iters: int, sor_iters: int, omega: float,
                alpha: float, delta: float, gamma: float, beta: float,
                use_match: bool, height: int, width: int,
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

    yy = lax.broadcasted_iota(jnp.int32, (padded_h, padded_w), 0)
    xx = lax.broadcasted_iota(jnp.int32, (padded_h, padded_w), 1)
    red = ((yy + xx) % 2) == 0

    def robust(x2):
        return 1.0 / (2.0 * jnp.sqrt(x2 + 1e-6))

    def psi_body(_, carry):
        du = scratch[s_du]
        dv = scratch[s_dv]
        # data-term robust weights, lagged at the current increment
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

        if use_match:
            ru = u0 + du - um
            rv = v0 + dv - vm
            a_m = beta * conf * robust(ru * ru + rv * rv)
            a11 = a11 + a_m
            a22 = a22 + a_m
            b1 = b1 + a_m * (um - u0)
            b2 = b2 + a_m * (vm - v0)

        # smoothness weights: psi' of the flow-gradient magnitude at the
        # current increment (centered differences, replicate borders),
        # then EDGE-AVERAGED diffusivities for div(psi' grad w) — same
        # arithmetic (and order) as deepflow._sor_sweeps
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
        # constant part of the smoothness rhs: flux of the level's base
        # flow across each edge (the du part updates inside the sweeps)
        su0 = (wn * prv_row(u0) + ws * nxt_row(u0) +
               ww * prv_col(u0) + we * nxt_col(u0) - wsum * u0)
        sv0 = (wn * prv_row(v0) + ws * nxt_row(v0) +
               ww * prv_col(v0) + we * nxt_col(v0) - wsum * v0)

        denom = (a11 + wsum) * (a22 + wsum) - a12 * a12
        denom = jnp.where(jnp.abs(denom) > 1e-6, denom, 1e-6)
        inv_denom = 1.0 / denom
        rhs1c = b1 + su0
        rhs2c = b2 + sv0
        p11 = a11 + wsum
        p22 = a22 + wsum

        def half_sweep(du, dv, mask):
            dun = (wn * prv_row(du) + ws * nxt_row(du) +
                   ww * prv_col(du) + we * nxt_col(du))
            dvn = (wn * prv_row(dv) + ws * nxt_row(dv) +
                   ww * prv_col(dv) + we * nxt_col(dv))
            rhs1 = rhs1c + dun
            rhs2 = rhs2c + dvn
            du_star = (p22 * rhs1 - a12 * rhs2) * inv_denom
            dv_star = (p11 * rhs2 - a12 * rhs1) * inv_denom
            du = jnp.where(mask, (1.0 - omega) * du + omega * du_star, du)
            dv = jnp.where(mask, (1.0 - omega) * dv + omega * dv_star, dv)
            return du, dv

        def sor_body(_, c2):
            du, dv = c2
            du, dv = half_sweep(du, dv, red)
            du, dv = half_sweep(du, dv, ~red)
            return du, dv

        du, dv = lax.fori_loop(0, sor_iters, sor_body, (du, dv),
                               unroll=False)
        scratch[s_du] = du
        scratch[s_dv] = dv
        return carry

    lax.fori_loop(0, psi_iters, psi_body, 0, unroll=False)

    c1 = pltpu.make_async_copy(scratch.at[s_du], du_out.at[b], sem.at[0])
    c2 = pltpu.make_async_copy(scratch.at[s_dv], dv_out.at[b], sem.at[1])
    c1.start()
    c2.start()
    c1.wait()
    c2.wait()


@functools.partial(
    jax.jit,
    static_argnames=("psi_iters", "sor_iters", "omega", "alpha", "delta",
                     "gamma", "beta", "interpret"))
def sor_sweeps_pallas(i1wx, i1wy, i1wxx, i1wxy, i1wyy, it, itx, ity,
                      u0, v0, match=None, *, psi_iters: int,
                      sor_iters: int, omega: float, alpha: float,
                      delta: float, gamma: float, beta: float = 0.0,
                      interpret: bool = False):
    """VMEM-resident twin of deepflow._sor_sweeps' psi x SOR solve.

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
        _sor_kernel, psi_iters=psi_iters, sor_iters=sor_iters, omega=omega,
        alpha=alpha, delta=delta, gamma=gamma, beta=beta,
        use_match=use_match, height=h, width=w,
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
                     budget_bytes: int = 60 * 1024 * 1024) -> bool:
    """Whether the whole-image SOR kernel fits comfortably in VMEM:
    15 resident slabs + ~11 per-psi coefficient temporaries, x ~1.5
    headroom for the sweeps' intermediates."""
    padded_h, padded_w = pad_to_tpu_tile(h, w)
    return int(26 * padded_h * padded_w * 4 * 1.5) <= budget_bytes
