"""DeepFlow backend vs the independent float64 Brox/DeepFlow oracle
(ops/deepflow_oracle.py) — the second backend's analogue of the TV-L1
IPOL golden tests (VERDICT round 2, item 5)."""

import numpy as np
import pytest
from scipy import ndimage

from tee_optical_flow_tpu.ops.deepflow_oracle import deepflow_flow_oracle, epe


def _texture(rng, h, w, smooth=3.0):
    img = ndimage.gaussian_filter(rng.uniform(size=(h, w)), smooth)
    img = (img - img.min()) / (img.max() - img.min())
    return (img * 255.0).astype(np.float64)


def test_oracle_recovers_known_shift(rng):
    """Precondition for golden use: the oracle itself recovers a known
    synthetic shift essentially exactly."""
    img = _texture(rng, 72, 88, smooth=2.0)
    i1 = ndimage.shift(img, (1.0, -2.0), order=3, mode="nearest")
    flow = deepflow_flow_oracle(img, i1, nscales=3)
    interior = flow[8:-8, 8:-8]
    err = np.hypot(interior[..., 0] + 2.0, interior[..., 1] - 1.0)
    assert np.median(err) < 1e-6, f"median EPE {np.median(err):.2e}"


def test_oracle_zero_motion_is_zero(rng):
    img = _texture(rng, 48, 56, smooth=2.0)
    flow = deepflow_flow_oracle(img, img, nscales=2)
    assert np.abs(flow).max() < 1e-8


@pytest.mark.slow
def test_deepflow_backend_matches_brox_oracle(rng):
    """Golden EPE test (CI-sized): the jitted DeepFlow backend vs the
    float64 Brox/DeepFlow oracle at identical energy parameters on smooth
    non-rigid motion, matching disabled in both (the matcher is pinned
    separately by ground-truth displacement tests). Since round 4 both
    use the textbook edge-averaged diffusivities; the remaining numeric
    difference is damped Jacobi vs red-black SOR ordering, so the
    contract is interior agreement. Full-resolution numbers live in
    EPE_r04.json (epe_report.py)."""
    import jax
    import jax.numpy as jnp

    from tee_optical_flow_tpu.ops.deepflow import deepflow_pairs

    h, w = 96, 120
    img = _texture(rng, h, w, smooth=3.0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    u = 1.5 * np.sin(2 * np.pi * yy / h)
    v = -1.0 * np.cos(2 * np.pi * xx / w)
    i1 = ndimage.map_coordinates(img, [yy + v, xx + u], order=3,
                                 mode="nearest")

    # matched-count protocol at the round-5 production schedule (the
    # solver now runs the oracle's exact psi x red-black-SOR numerics)
    golden = deepflow_flow_oracle(img, i1, nscales=3, fp_iters=3,
                                  psi_iters=3, sor_iters=12, omega=1.6)
    ours = np.asarray(deepflow_pairs(
        jnp.asarray(img[None], jnp.float32), jnp.asarray(i1[None], jnp.float32),
        nscales=3, matching=False, iters=12, psi_iters=3, omega=1.6,
        fp_iters=3))[0]
    err = epe(ours, golden)[8:-8, 8:-8]
    assert np.median(err) < 0.06, f"median EPE {np.median(err):.4f}"
    assert np.percentile(err, 95) < 0.15, \
        f"p95 EPE {np.percentile(err, 95):.4f}"


@pytest.mark.slow
def test_deepflow_echo_masked_contract(rng):
    """Production-defaults echo pin (VERDICT r3 next #3): edge-averaged
    diffusivities + bicubic (Catmull-Rom) warps — the round-4 defaults —
    vs the float64 Brox oracle on the synthetic TEE sector, reported over
    the masks the pipeline consumes. The wall (myocardium) numbers are
    the product contract (< 0.1 px p95); the round-3 gap (wall p95
    0.110 px, interior median 1.19 px at 480x640) was dominated by the
    bilinear-vs-bicubic warp divergence, exactly like TV-L1's. Measured
    here (120x160, CPU): wall p95 0.067 px, sector p95 0.096 px;
    full-res figures in EPE_r04.json deepflow sections."""
    import jax.numpy as jnp

    from tee_optical_flow_tpu.ops.deepflow import deepflow_pairs
    from tee_optical_flow_tpu.synthetic import echo_sector_masks, make_echo_pair

    h, w = 120, 160
    i0, i1 = make_echo_pair(100, h, w, contraction=0.05)
    golden = deepflow_flow_oracle(i0, i1, fp_iters=3, psi_iters=3,
                                  sor_iters=12, omega=1.6, alpha=8.0,
                                  delta=0.5, gamma=5.0, nscales=3, zoom=0.5)
    ours = np.asarray(deepflow_pairs(
        jnp.asarray(i0[None]), jnp.asarray(i1[None]), iters=12, psi_iters=3,
        omega=1.6, fp_iters=3,
        matching=False, alpha=8.0, delta=0.5, gamma=5.0, nscales=3,
        zoom=0.5, interpolation="bicubic"))[0]
    err = epe(ours, golden)
    masks = echo_sector_masks(h, w)
    interior = np.zeros((h, w), bool)
    interior[8:-8, 8:-8] = True
    wall = err[masks["wall"] & interior]
    sector = err[masks["sector"] & interior]
    assert np.percentile(wall, 95) < 0.1, np.percentile(wall, 95)
    assert np.median(wall) < 0.02, np.median(wall)
    assert np.percentile(sector, 95) < 0.13, np.percentile(sector, 95)
