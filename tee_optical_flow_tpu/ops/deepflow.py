"""DeepFlow-style variational optical flow (second backend).

The reference's second flow algorithm is cv2.optflow.createOptFlow_DeepFlow
(calculate_optical_flow.py:565-568): DeepMatching correspondences feeding a
Brox-style variational energy with intensity + gradient constancy and a
smoothness term (Weinzaepfel et al., ICCV 2013). This backend implements
both halves TPU-natively:

- the variational refinement — coarse-to-fine warping with intensity +
  gradient constancy solved by a fixed-point scheme of lagged-
  nonlinearity (psi) recomputes x red-black SOR sweeps (omega=1.6, the
  relaxation OpenCV's own DeepFlow runs) — batched over frame pairs
  like the TV-L1 kernel; and
- the matching term: dense patch-NCC cost volumes over a bounded integer
  search window at the two coarsest pyramid levels (built from static
  shifts, no gathers), forward-backward verified, entering the energy as
  the soft constraint beta * conf * psi(|w - w_match|^2) exactly where
  DeepMatching correspondences enter DeepFlow's energy. This is what
  recovers large displacements that exceed the warping linearization
  range (fast RV free walls, aliased speckle).

Pixel-exact parity with OpenCV's DeepFlow is not claimed; the backend is
validated on the same synthetic ground-truth displacement contract as
TV-L1 plus a large-displacement test that fails with matching disabled.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .warp import (
    bilinear_warp, build_pyramid, centered_gradient, pyramid_shapes,
    resize_bilinear, resize_cubic, warp_many_shift, warp_many_shift_tiled2d,
)

_EPS = 1e-6
# shift-warp residual radius above which the 2-D tiled decomposition
# takes over (same scheme as ops/tvl1.py)
_DF_LOCAL_R = 8


def _robust(x2: jnp.ndarray) -> jnp.ndarray:
    """Charbonnier penalty derivative psi'(x^2) = 1 / (2 sqrt(x^2 + eps^2))."""
    return 1.0 / (2.0 * jnp.sqrt(x2 + 1e-6))


def _smoothness_weights(u, v):
    """psi' of the flow gradient magnitude, per pixel."""
    ux, uy = centered_gradient(u)
    vx, vy = centered_gradient(v)
    return _robust(ux * ux + uy * uy + vx * vx + vy * vy)


def _box_mean(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Mean over a (2r+1)^2 window, zero-padded with true-count division."""
    k = 2 * radius + 1
    ones = jnp.ones_like(x)
    s = lax.reduce_window(x, 0.0, lax.add, (1, k, k), (1, 1, 1), "SAME")
    n = lax.reduce_window(ones, 0.0, lax.add, (1, k, k), (1, 1, 1), "SAME")
    return s / n


def coarse_match(i0: jnp.ndarray, i1: jnp.ndarray, *, radius: int = 4,
                 patch: int = 3, ncc_min: float = 0.3,
                 fb_tol: float = 1.5, margin_min: float = 0.02):
    """Dense integer matching via a patch-NCC cost volume.

    For every pixel of ``i0`` (B, h, w), searches ``i1`` over the
    (2*radius+1)^2 integer displacement window using zero-mean NCC over a
    (2*patch+1)^2 patch. The cost volume is built from static pad+slice
    shifts (no gathers). Near-ties break toward the smaller displacement
    (smooth textures correlate ~1 under any small shift); matches are
    forward-backward verified and must beat the runner-up displacement by
    ``margin_min`` (ambiguous/aperture matches carry no information the
    variational term doesn't already have).

    Returns (um, vm, conf): the match displacement fields and a {0,1}
    confidence mask.
    """

    r2max = 2.0 * radius * radius
    tie_bias = margin_min / 2.0
    offs = np.arange(-radius, radius + 1)
    disps = np.stack(np.meshgrid(offs, offs, indexing="ij"),
                     axis=-1).reshape(-1, 2).astype(np.int32)  # (D, [dy dx])

    def best_match(a0, a1):
        # exact windowed ZNCC: cov(P0, P1d) / sqrt(var(P0) var(P1d)),
        # with the target-side mean/var precomputed once and shifted
        b, h, w = a0.shape
        m0 = _box_mean(a0, patch)
        var0 = _box_mean(a0 * a0, patch) - m0 * m0
        m1 = _box_mean(a1, patch)
        var1 = _box_mean(a1 * a1, patch) - m1 * m1
        pad = ((0, 0), (radius, radius), (radius, radius))
        p1 = jnp.pad(a1, pad)
        pm1 = jnp.pad(m1, pad)
        pv1 = jnp.pad(var1, pad)
        yy = jnp.arange(h)[:, None]
        xx = jnp.arange(w)[None, :]

        def step(carry, d):
            best, second, bu, bv = carry
            dy, dx = d[0], d[1]
            start = (jnp.int32(0), radius + dy, radius + dx)
            s1 = lax.dynamic_slice(p1, start, (b, h, w))
            sm1 = lax.dynamic_slice(pm1, start, (b, h, w))
            sv1 = lax.dynamic_slice(pv1, start, (b, h, w))
            cov = _box_mean(a0 * s1, patch) - m0 * sm1
            ncc = cov * lax.rsqrt(var0 * sv1 + 1e-8)
            ncc = ncc - tie_bias * (dy * dy + dx * dx) / r2max
            # a candidate whose target patch leaves the image correlates
            # against zero-padding — exclude it rather than trust it
            valid = ((yy + dy >= patch) & (yy + dy < h - patch) &
                     (xx + dx >= patch) & (xx + dx < w - patch))[None]
            ncc = jnp.where(valid, ncc, -jnp.inf)
            take = ncc > best
            second = jnp.where(take, best, jnp.maximum(second, ncc))
            best = jnp.where(take, ncc, best)
            bu = jnp.where(take, dx.astype(jnp.float32), bu)
            bv = jnp.where(take, dy.astype(jnp.float32), bv)
            return (best, second, bu, bv), None

        neg = jnp.full((b, h, w), -jnp.inf, jnp.float32)
        zero = jnp.zeros((b, h, w), jnp.float32)
        (best, second, bu, bv), _ = lax.scan(
            step, (neg, neg, zero, zero), jnp.asarray(disps))
        return bu, bv, best, second

    a0 = i0.astype(jnp.float32)
    a1 = i1.astype(jnp.float32)
    uf, vf, ncc_f, second_f = best_match(a0, a1)
    ub, vb, _, _ = best_match(a1, a0)
    # backward match sampled at the forward-matched position
    ub_at = bilinear_warp(ub, uf, vf)
    vb_at = bilinear_warp(vb, uf, vf)
    fb_ok = ((jnp.abs(uf + ub_at) <= fb_tol) &
             (jnp.abs(vf + vb_at) <= fb_tol))
    # ambiguous matches (runner-up within margin) carry no information —
    # including ambiguous zero matches: pinning weak-texture regions to
    # zero displacement would fight real sub-threshold motion there
    informative = (ncc_f - second_f) > margin_min
    # source patches straddling the border are z-normalized on truncated
    # windows; don't trust them
    b, h, w = uf.shape
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    interior = ((yy >= patch) & (yy < h - patch) &
                (xx >= patch) & (xx < w - patch))[None]
    conf = (fb_ok & informative & interior &
            (ncc_f > ncc_min)).astype(jnp.float32)
    return uf, vf, conf


def _shifts4(f):
    """(N, S, W, E) single-pixel shifts, edge-replicated: the border
    neighbor is the pixel itself, so border-edge flux vanishes — the same
    homogeneous-Neumann fixed point as the oracle's zeroed border
    weights."""
    p = jnp.pad(f, ((0, 0), (1, 1), (1, 1)), mode="edge")
    return (p[:, :-2, 1:-1], p[:, 2:, 1:-1],
            p[:, 1:-1, :-2], p[:, 1:-1, 2:])


def _checkerboard(shape):
    yy = lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)
    xx = lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return ((yy + xx) % 2) == 0


def _sor_sweeps(i0, i1w, i1wx, i1wy, i1wxx, i1wxy, i1wyy, u0, v0, *,
                alpha, delta, gamma, psi_iters, sor_iters, omega,
                match=None, beta=0.0, use_pallas=False):
    """Fixed-point solve for the flow increment (du, dv): lagged
    nonlinearity (psi) recomputes x red-black SOR sweeps.

    Round 5: replaces the damped-Jacobi loop. Measured at 240x320 echo
    (matching path, both-vs-converged-float64-oracle): damped Jacobi at
    the old iters=25 left the low-data cavity under-converged (sector
    p95 0.13-0.16 px vs the oracle's own 0.04 px convergence floor);
    red-black SOR with omega=1.6 — the relaxation OpenCV's DeepFlow
    itself runs (variational layer: sorIterations, omega=1.6) and the
    float64 oracle's exact numerics (ops/deepflow_oracle.py) — reaches
    the fixed point at production counts. Nesting, update order and
    constants mirror deepflow_scale_oracle line for line."""
    it = i1w - i0                      # temporal intensity difference
    i0x, i0y = centered_gradient(i0)
    itx = i1wx - i0x                   # gradient-constancy temporal diffs
    ity = i1wy - i0y

    if use_pallas:
        # whole-image VMEM-resident solve (ops/deepflow_pallas.py);
        # it/itx/ity computed here in XLA where they fuse into the warp
        from .deepflow_pallas import sor_sweeps_pallas

        return sor_sweeps_pallas(
            i1wx, i1wy, i1wxx, i1wxy, i1wyy, it, itx, ity, u0, v0, match,
            psi_iters=psi_iters, sor_iters=sor_iters, omega=omega,
            alpha=alpha, delta=delta, gamma=gamma, beta=beta)

    du = jnp.zeros_like(u0)
    dv = jnp.zeros_like(v0)
    red = _checkerboard(u0.shape)
    if match is not None:
        um, vm, conf = match

    def psi_body(_, carry):
        du, dv = carry
        # data-term robust weights, lagged at the current increment
        r_int = it + i1wx * du + i1wy * dv
        r_gx = itx + i1wxx * du + i1wxy * dv
        r_gy = ity + i1wxy * du + i1wyy * dv
        psi_d = _robust(r_int * r_int) * delta
        psi_g = _robust(r_gx * r_gx + r_gy * r_gy) * gamma

        # linear system coefficients (per pixel)
        a11 = psi_d * i1wx * i1wx + psi_g * (i1wxx * i1wxx + i1wxy * i1wxy)
        a12 = psi_d * i1wx * i1wy + psi_g * (i1wxx * i1wxy + i1wxy * i1wyy)
        a22 = psi_d * i1wy * i1wy + psi_g * (i1wxy * i1wxy + i1wyy * i1wyy)
        b1 = -(psi_d * i1wx * it + psi_g * (i1wxx * itx + i1wxy * ity))
        b2 = -(psi_d * i1wy * it + psi_g * (i1wxy * itx + i1wyy * ity))

        # matching soft constraint: beta * conf * psi(|w - w_match|^2)
        # (DeepFlow's matching energy term, Weinzaepfel et al. eq. 2)
        if match is not None:
            ru = u0 + du - um
            rv = v0 + dv - vm
            a_m = beta * conf * _robust(ru * ru + rv * rv)
            a11 = a11 + a_m
            a22 = a22 + a_m
            b1 = b1 + a_m * (um - u0)
            b2 = b2 + a_m * (vm - v0)

        # smoothness: div(psi' grad w) with EDGE-AVERAGED diffusivities
        # w_{i+1/2,j} = (psi'_i + psi'_{i+1})/2 — the textbook (and
        # oracle's) discretization, lagged at the current increment
        w = _smoothness_weights(u0 + du, v0 + dv) * alpha
        wn, ws, ww, we = ((0.5 * (w + s)) for s in _shifts4(w))
        wsum = wn + ws + ww + we
        # constant part of the smoothness rhs: flux of the level's base
        # flow across each edge (the du part updates inside the sweeps)
        un, us, uw, ue = _shifts4(u0)
        vn, vs, vw, ve = _shifts4(v0)
        su0 = wn * un + ws * us + ww * uw + we * ue - wsum * u0
        sv0 = wn * vn + ws * vs + ww * vw + we * ve - wsum * v0

        denom = (a11 + wsum) * (a22 + wsum) - a12 * a12
        denom = jnp.where(jnp.abs(denom) > _EPS, denom, _EPS)
        inv_denom = 1.0 / denom
        rhs1c = b1 + su0
        rhs2c = b2 + sv0

        def half_sweep(du, dv, mask):
            dn, ds_, dw, de = _shifts4(du)
            dun = wn * dn + ws * ds_ + ww * dw + we * de
            dn, ds_, dw, de = _shifts4(dv)
            dvn = wn * dn + ws * ds_ + ww * dw + we * de
            rhs1 = rhs1c + dun
            rhs2 = rhs2c + dvn
            du_star = ((a22 + wsum) * rhs1 - a12 * rhs2) * inv_denom
            dv_star = ((a11 + wsum) * rhs2 - a12 * rhs1) * inv_denom
            du = jnp.where(mask, (1.0 - omega) * du + omega * du_star, du)
            dv = jnp.where(mask, (1.0 - omega) * dv + omega * dv_star, dv)
            return du, dv

        def sor_body(_, carry):
            du, dv = carry
            du, dv = half_sweep(du, dv, red)
            du, dv = half_sweep(du, dv, ~red)
            return du, dv

        return lax.fori_loop(0, sor_iters, sor_body, (du, dv))

    return lax.fori_loop(0, psi_iters, psi_body, (du, dv))


@functools.partial(
    jax.jit, static_argnames=("alpha", "delta", "gamma", "nscales", "zoom",
                              "iters", "psi_iters", "omega", "matching",
                              "match_radius", "beta", "fp_iters", "max_disp",
                              "use_pallas", "interpolation"))
def deepflow_pairs(i0: jnp.ndarray, i1: jnp.ndarray, *,
                   alpha: float = 8.0, delta: float = 0.5, gamma: float = 5.0,
                   nscales: int = 5, zoom: float = 0.5,
                   iters: int = 12, psi_iters: int = 3, omega: float = 1.6,
                   matching: bool = True,
                   match_radius: int = 4, beta: float = 0.3,
                   fp_iters: int = 3, max_disp: int = 16,
                   use_pallas: bool = False,
                   interpolation: str = "bilinear") -> jnp.ndarray:
    """Variational flow for (B, H, W) pairs -> (B, H, W, 2).

    ``matching`` enables the DeepFlow matching term: patch-NCC cost-volume
    matches at the two coarsest pyramid levels feed the energy as a soft
    constraint of weight ``beta`` (0 disables; refinement only).
    ``fp_iters`` fixed-point (re-warping) iterations run per level;
    ``psi_iters`` lagged-nonlinearity recomputes per fixed point and
    ``iters`` red-black SOR sweeps (relaxation ``omega``) per psi round —
    the nesting OpenCV's own DeepFlow runs (sorIterations, omega=1.6) and
    the float64 oracle's exact numerics (round 5; the previous damped
    Jacobi under-converged the low-data cavity).
    ``max_disp`` bounds the finest-level displacement for the shift warp.
    ``use_pallas`` runs each level's solve in the VMEM-resident fused
    kernel (TPU only; levels that would not fit VMEM fall back).
    ``interpolation`` picks the warp kernel + inter-level flow upsample:
    "bilinear" (hat shift-warps, the fast default) or "bicubic"
    (Catmull-Rom — the published algorithm's interpolator, same as
    tvl1's accuracy mode).
    """
    if use_pallas:
        # config.py promises the flag is ignored off-TPU: the kernel's
        # pltpu primitives only lower on the TPU backend
        from .pallas_common import on_tpu_backend

        use_pallas = on_tpu_backend()
    i0 = i0.astype(jnp.float32)
    i1 = i1.astype(jnp.float32)
    b, h, w = i0.shape
    shapes = pyramid_shapes(h, w, nscales, zoom)
    pyr0 = build_pyramid(i0, shapes)
    pyr1 = build_pyramid(i1, shapes)
    match_levels = {len(shapes) - 1, len(shapes) - 2} if matching else set()

    ch, cw = shapes[-1]
    u = jnp.zeros((b, ch, cw), jnp.float32)
    v = jnp.zeros((b, ch, cw), jnp.float32)
    coarsest_match = None
    if matching:
        # Matches seed the coarsest level (this is what lets the solver
        # escape the zero-flow minimum on displacements beyond the warping
        # linearization range); unconfident pixels take a confidence-
        # weighted neighborhood fill of the confident ones. The same cost
        # volume feeds the coarsest level's matching term below.
        coarsest_match = coarse_match(pyr0[-1], pyr1[-1],
                                      radius=match_radius)
        um, vm, conf = coarsest_match
        fill = max(ch, cw) // 4 + 1
        wsum = _box_mean(conf, fill) + 1e-6
        u = _box_mean(um * conf, fill) / wsum
        v = _box_mean(vm * conf, fill) / wsum
    for lvl in range(len(shapes) - 1, -1, -1):
        a0 = pyr0[lvl]
        a1 = pyr1[lvl]
        # per-level displacement bound for the gather-free shift warp:
        # motion in level-lvl pixels scales by zoom^lvl; the coarsest
        # levels also carry the matching seed (<= match_radius)
        lvl_disp = max(match_radius + 1 if matching else 3,
                       int(round(max_disp * (zoom ** lvl))) + 1)

        if lvl == len(shapes) - 1 and coarsest_match is not None:
            match = coarsest_match  # reuse the seed's cost volume
        elif lvl in match_levels:
            match = coarse_match(a0, a1, radius=match_radius)
        else:
            match = None
        # fixed-point outer loop: re-warp and re-linearize around the
        # updated flow (OpenCV DeepFlow's fixedPointIterations; without
        # it a level's increment is limited to the ~1 px linearization
        # range and upscale errors compound). The five derivative images
        # are warped alongside i1 — Brox's formulation; differentiating
        # the warped image instead was measured to diverge under the
        # fixed point (the flow Jacobian enters the data term's
        # gradients). All six share one set of shift-warp hat weights.
        i1x, i1y = centered_gradient(a1)
        i1xx, i1xy = centered_gradient(i1x)
        _, i1yy = centered_gradient(i1y)
        imgs = (a1, i1x, i1y, i1xx, i1xy, i1yy)
        for _ in range(fp_iters):
            if lvl_disp > _DF_LOCAL_R:
                warped = warp_many_shift_tiled2d(
                    imgs, u, v, max_disp=lvl_disp,
                    local_r=_DF_LOCAL_R, kernel=interpolation)
            else:
                warped = warp_many_shift(imgs, u, v, max_disp=lvl_disp,
                                         kernel=interpolation)
            if use_pallas:
                from .deepflow_pallas import fits_vmem_jacobi

                lvl_pallas = fits_vmem_jacobi(*shapes[lvl])
            else:
                lvl_pallas = False
            du, dv = _sor_sweeps(a0, *warped, u, v, alpha=alpha,
                                 delta=delta, gamma=gamma,
                                 psi_iters=psi_iters, sor_iters=iters,
                                 omega=omega, match=match, beta=beta,
                                 use_pallas=lvl_pallas)
            u = u + du
            v = v + dv
        if lvl > 0:
            nh, nw = shapes[lvl - 1]
            sx = nw / shapes[lvl][1]
            sy = nh / shapes[lvl][0]
            resize = (resize_bilinear if interpolation == "bilinear"
                      else resize_cubic)
            u = resize(u, nh, nw) * sx
            v = resize(v, nh, nw) * sy
    return jnp.stack([u, v], axis=-1)


def deepflow_clip_flow(frames: jnp.ndarray, config=None, **overrides) -> jnp.ndarray:
    """Flow for all consecutive pairs of a (N, H, W) clip -> (N-1, H, W, 2)."""
    from .pallas_common import on_tpu_backend

    on_tpu = on_tpu_backend()
    params = dict(alpha=8.0, delta=0.5, gamma=5.0, nscales=5, zoom=0.5,
                  iters=12, psi_iters=3, omega=1.6,
                  matching=True, match_radius=4, beta=0.3,
                  fp_iters=3, max_disp=16, use_pallas=on_tpu,
                  interpolation="bicubic")
    if config is not None:
        params.update(alpha=config.deepflow_alpha, delta=config.deepflow_delta,
                      gamma=config.deepflow_gamma,
                      iters=config.deepflow_sor_iterations,
                      psi_iters=config.deepflow_psi_iterations,
                      omega=config.deepflow_omega,
                      nscales=config.deepflow_nscales,
                      matching=config.deepflow_matching,
                      match_radius=config.deepflow_match_radius,
                      beta=config.deepflow_beta,
                      fp_iters=config.deepflow_fp_iterations,
                      max_disp=config.deepflow_max_displacement,
                      use_pallas=config.deepflow_use_pallas and on_tpu,
                      interpolation=config.deepflow_interpolation)
    params.update(overrides)
    frames = jnp.asarray(frames)
    return deepflow_pairs(frames[:-1], frames[1:], **params)
