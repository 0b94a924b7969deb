"""Radial / longitudinal flow decomposition about the AV centroid.

Parity with reference analysis.py:89-163, replacing its per-frame
construction of explicit (H, W, 2) unit-vector grids with a closed-form
jitted kernel batched over frames: unit = (c - p)/||c - p||, radial =
<flow, unit>, longitudinal = <flow, (unit_1, -unit_0)>.

Channel convention is preserved exactly as the reference pairs them
(analysis.py:104-119): unit channel 0 is the *row* delta and is dotted
with flow channel 0, channel 1 is the *column* delta dotted with flow
channel 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


@jax.jit
def radial_vecgrid(h_w_dummy: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """Unit-vector field toward per-frame centroids.

    h_w_dummy: any (H, W) array fixing the spatial shape.
    centroids: (N, 2) as (row, col).
    Returns (N, H, W, 2) with nan-at-center replaced by 0
    (reference analysis.py:89-119).
    """
    h, w = h_w_dummy.shape
    rows = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cols = lax.broadcasted_iota(jnp.float32, (h, w), 1)

    def one(c):
        dr = c[0] - rows
        dc = c[1] - cols
        norm = jnp.sqrt(dr * dr + dc * dc)
        inv = jnp.where(norm > 0, 1.0 / jnp.maximum(norm, 1e-20), 0.0)
        return jnp.stack([dr * inv, dc * inv], axis=-1)

    return jax.vmap(one)(centroids.astype(jnp.float32))


def calc_proj_mag(of_arr: jnp.ndarray, unitvec_arr: jnp.ndarray) -> jnp.ndarray:
    """Dot product along the vector channel (reference analysis.py:122-134)."""
    return jnp.sum(of_arr * unitvec_arr, axis=3)


@jax.jit
def _comp_magnitude_kernel(of_arr: jnp.ndarray, centroids: jnp.ndarray):
    h, w = of_arr.shape[1], of_arr.shape[2]
    rows = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cols = lax.broadcasted_iota(jnp.float32, (h, w), 1)

    def one(flow, c):
        dr = c[0] - rows
        dc = c[1] - cols
        norm = jnp.sqrt(dr * dr + dc * dc)
        inv = jnp.where(norm > 0, 1.0 / jnp.maximum(norm, 1e-20), 0.0)
        ur = dr * inv
        uc = dc * inv
        rad = flow[..., 0] * ur + flow[..., 1] * uc
        # orthogonal unit = (uc, -ur)  (reference analysis.py:157)
        lng = flow[..., 0] * uc - flow[..., 1] * ur
        return rad, lng

    return jax.vmap(one)(of_arr.astype(jnp.float32), centroids.astype(jnp.float32))


def calculate_comp_magnitude(of_arr, centroids, verbose: bool = False):
    """(N, H, W, 2) flow + (N, 2) centroids -> (rad (N, H, W), long (N, H, W)).

    Truncates flow to the centroid-track length like the reference
    (analysis.py:146)."""
    import numpy as np

    centroids = jnp.asarray(np.asarray(centroids))
    nframes = centroids.shape[0]
    of_arr = jnp.asarray(of_arr)[:nframes]
    rad, lng = _comp_magnitude_kernel(of_arr, centroids)
    return rad, lng
