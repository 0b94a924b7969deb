"""DeepFlow-style variational optical flow (second backend).

The reference's second flow algorithm is cv2.optflow.createOptFlow_DeepFlow
(calculate_optical_flow.py:565-568): DeepMatching correspondences feeding a
Brox-style variational energy with intensity + gradient constancy and a
smoothness term (Weinzaepfel et al., ICCV 2013). For TEE clips the
inter-frame motion is small and smooth, so the matching term contributes
little; this backend implements the variational refinement — coarse-to-fine
warping with intensity+gradient constancy solved by fixed-point Jacobi
sweeps — batched over frame pairs like the TV-L1 kernel.

Pixel-exact parity with OpenCV's DeepFlow is not claimed; the backend is
validated on the same synthetic ground-truth displacement contract as
TV-L1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .warp import (
    bilinear_warp, build_pyramid, centered_gradient, pyramid_shapes,
    resize_bilinear,
)

_EPS = 1e-6


def _robust(x2: jnp.ndarray) -> jnp.ndarray:
    """Charbonnier penalty derivative psi'(x^2) = 1 / (2 sqrt(x^2 + eps^2))."""
    return 1.0 / (2.0 * jnp.sqrt(x2 + 1e-6))


def _smoothness_weights(u, v):
    """psi' of the flow gradient magnitude, per pixel."""
    ux, uy = centered_gradient(u)
    vx, vy = centered_gradient(v)
    return _robust(ux * ux + uy * uy + vx * vx + vy * vy)


def _jacobi_sweeps(i0, i1w, i1wx, i1wy, i1wxx, i1wxy, i1wyy, u0, v0, *,
                   alpha, delta, gamma, iters):
    """Fixed-point + Jacobi solve for the flow increment (du, dv)."""
    it = i1w - i0                      # temporal intensity difference
    i0x, i0y = centered_gradient(i0)
    itx = i1wx - i0x                   # gradient-constancy temporal diffs
    ity = i1wy - i0y

    du = jnp.zeros_like(u0)
    dv = jnp.zeros_like(v0)

    def body(_, carry):
        du, dv = carry
        # data-term robust weights at current increment
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

        # smoothness: weighted 4-neighbor laplacian on (u0+du, v0+dv)
        w = _smoothness_weights(u0 + du, v0 + dv) * alpha

        def nbr_sum(f):
            p = jnp.pad(f, ((0, 0), (1, 1), (1, 1)), mode="edge")
            return (p[:, :-2, 1:-1] + p[:, 2:, 1:-1] +
                    p[:, 1:-1, :-2] + p[:, 1:-1, 2:])

        wsum = 4.0 * w
        su = nbr_sum(u0 + du) * w - wsum * u0
        sv = nbr_sum(v0 + dv) * w - wsum * v0

        # Jacobi update of the coupled 2x2 system per pixel
        denom = (a11 + wsum) * (a22 + wsum) - a12 * a12
        denom = jnp.where(jnp.abs(denom) > _EPS, denom, _EPS)
        rhs1 = b1 + su
        rhs2 = b2 + sv
        du_new = ((a22 + wsum) * rhs1 - a12 * rhs2) / denom
        dv_new = ((a11 + wsum) * rhs2 - a12 * rhs1) / denom
        # damped update for stability
        return 0.5 * (du + du_new), 0.5 * (dv + dv_new)

    du, dv = lax.fori_loop(0, iters, body, (du, dv))
    return du, dv


@functools.partial(
    jax.jit, static_argnames=("alpha", "delta", "gamma", "nscales", "zoom",
                              "iters"))
def deepflow_pairs(i0: jnp.ndarray, i1: jnp.ndarray, *,
                   alpha: float = 1.0, delta: float = 0.5, gamma: float = 5.0,
                   nscales: int = 5, zoom: float = 0.5,
                   iters: int = 25) -> jnp.ndarray:
    """Variational flow for (B, H, W) pairs -> (B, H, W, 2)."""
    i0 = i0.astype(jnp.float32)
    i1 = i1.astype(jnp.float32)
    b, h, w = i0.shape
    shapes = pyramid_shapes(h, w, nscales, zoom)
    pyr0 = build_pyramid(i0, shapes)
    pyr1 = build_pyramid(i1, shapes)

    ch, cw = shapes[-1]
    u = jnp.zeros((b, ch, cw), jnp.float32)
    v = jnp.zeros((b, ch, cw), jnp.float32)
    for lvl in range(len(shapes) - 1, -1, -1):
        a0 = pyr0[lvl]
        a1 = pyr1[lvl]
        i1x, i1y = centered_gradient(a1)
        i1xx, i1xy = centered_gradient(i1x)
        _, i1yy = centered_gradient(i1y)

        i1w = bilinear_warp(a1, u, v)
        i1wx = bilinear_warp(i1x, u, v)
        i1wy = bilinear_warp(i1y, u, v)
        i1wxx = bilinear_warp(i1xx, u, v)
        i1wxy = bilinear_warp(i1xy, u, v)
        i1wyy = bilinear_warp(i1yy, u, v)

        du, dv = _jacobi_sweeps(a0, i1w, i1wx, i1wy, i1wxx, i1wxy, i1wyy,
                                u, v, alpha=alpha, delta=delta, gamma=gamma,
                                iters=iters)
        u = u + du
        v = v + dv
        if lvl > 0:
            nh, nw = shapes[lvl - 1]
            sx = nw / shapes[lvl][1]
            sy = nh / shapes[lvl][0]
            u = resize_bilinear(u, nh, nw) * sx
            v = resize_bilinear(v, nh, nw) * sy
    return jnp.stack([u, v], axis=-1)


def deepflow_clip_flow(frames: jnp.ndarray, config=None, **overrides) -> jnp.ndarray:
    """Flow for all consecutive pairs of a (N, H, W) clip -> (N-1, H, W, 2)."""
    params = dict(alpha=1.0, delta=0.5, gamma=5.0, nscales=5, zoom=0.5, iters=25)
    if config is not None:
        params.update(alpha=config.deepflow_alpha, delta=config.deepflow_delta,
                      gamma=config.deepflow_gamma,
                      iters=config.deepflow_iterations,
                      nscales=config.deepflow_nscales)
    params.update(overrides)
    frames = jnp.asarray(frames)
    return deepflow_pairs(frames[:-1], frames[1:], **params)
