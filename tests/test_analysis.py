"""Analysis math vs straight-numpy recreations of the reference formulas."""

import numpy as np

from tee_optical_flow_tpu.analysis.centroid import calc_AV_centroid
from tee_optical_flow_tpu.analysis.components import (
    calculate_comp_magnitude, radial_vecgrid,
)
from tee_optical_flow_tpu.analysis.histograms import (
    calc_bidirectional_hist, calculate_3dhist, calculate_3dhist_radlong,
    cart_to_polar,
)


def _ref_unitvec(h, w, centroid):
    """The reference's radial_vecgrid math for one frame (analysis.py:89-119)."""
    ch, cw = centroid
    rows, cols = np.mgrid[0:h, 0:w].astype(float)
    vec = np.stack([ch - rows, cw - cols], axis=-1)
    norm = np.linalg.norm(vec, axis=2, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        unit = np.nan_to_num(vec / norm, nan=0.0)
    return unit


def test_radial_vecgrid_matches_reference_math(rng):
    cents = np.array([[5.0, 7.0], [8.3, 3.1]])
    dummy = np.zeros((16, 12))
    ours = np.asarray(radial_vecgrid(dummy, cents))
    for i in range(2):
        ref = _ref_unitvec(16, 12, cents[i])
        np.testing.assert_allclose(ours[i], ref, atol=1e-5)


def test_comp_magnitude_matches_reference_math(rng):
    flow = rng.normal(size=(3, 16, 12, 2)).astype(np.float32)
    cents = np.array([[5.0, 7.0], [8.0, 3.0], [4.0, 4.0]])
    rad, lng = calculate_comp_magnitude(flow, cents)
    rad, lng = np.asarray(rad), np.asarray(lng)
    for i in range(3):
        unit = _ref_unitvec(16, 12, cents[i])
        ortho = np.stack([unit[..., 1], -unit[..., 0]], axis=-1)
        np.testing.assert_allclose(rad[i], (flow[i] * unit).sum(-1), atol=1e-4)
        np.testing.assert_allclose(lng[i], (flow[i] * ortho).sum(-1), atol=1e-4)


def test_cart_to_polar_matches_convention(rng):
    flow = rng.normal(size=(4, 4, 2)).astype(np.float32)
    mag, ang = cart_to_polar(flow)
    np.testing.assert_allclose(np.asarray(mag),
                               np.hypot(flow[..., 0], flow[..., 1]), atol=1e-5)
    ref_ang = np.mod(np.arctan2(flow[..., 1], flow[..., 0]), 2 * np.pi)
    np.testing.assert_allclose(np.asarray(ang), ref_ang, atol=1e-5)


def test_calc_AV_centroid_carryforward_and_smoothing(rng):
    n, h, w = 12, 24, 24
    masks = np.zeros((n, h, w, 2), np.uint8)
    for i in range(n):
        if i == 5:
            continue  # empty frame -> carry forward
        r = 6 + i % 3
        masks[i, r:r + 6, 8:14, :] = 1
    cents = calc_AV_centroid(masks, n, filter=False)
    assert cents.shape == (n, 2)
    np.testing.assert_allclose(cents[5], cents[4])  # carried forward
    smoothed = calc_AV_centroid(masks, n, filter=True, savgol_window=10, savgol_poly=4)
    assert smoothed.shape == (n, 2)
    assert np.std(np.diff(smoothed[:, 0])) <= np.std(np.diff(cents[:, 0])) + 1e-9


def test_bidirectional_hist_matches_numpy(rng):
    arr = rng.normal(size=(5, 10, 10)).astype(np.float32)
    arr[np.abs(arr) < 0.3] = 0.0
    freq, edges, hi, lo = calc_bidirectional_hist(arr, 5, perc_lo=1, perc_hi=99, nbins=40)
    gmin, gmax = arr.min(), arr.max()
    for i in range(5):
        nz = arr[i][arr[i] != 0]
        ref_freq, ref_edges = np.histogram(nz, bins=40, range=(gmin, gmax))
        np.testing.assert_array_equal(freq[i], ref_freq + 1)  # the +1 quirk
        np.testing.assert_allclose(hi[i], np.percentile(nz, 99), rtol=1e-4)
        np.testing.assert_allclose(lo[i], np.percentile(nz, 1), rtol=1e-4)
    np.testing.assert_allclose(edges, np.linspace(gmin, gmax, 41), atol=1e-6)


def test_bidirectional_hist_empty_frame_carryforward():
    arr = np.zeros((3, 6, 6), np.float32)
    arr[0, 2, 2] = 1.0
    arr[0, 3, 3] = 2.0
    # frame 1 all zeros -> carry frame 0 values; frame 2 has data
    arr[2, 1, 1] = 0.5
    freq, edges, hi, lo = calc_bidirectional_hist(arr, 3, nbins=8)
    np.testing.assert_array_equal(freq[1], freq[0])
    assert hi[1] == hi[0] and lo[1] == lo[0]


def test_calculate_3dhist_shapes(rng):
    arr = rng.normal(size=(4, 8, 8, 2)).astype(np.float32)
    mag, ang, mag_edges, ang_edges, perc_hi = calculate_3dhist(arr, 4, nbins=32, percentile=99)
    assert mag.shape == (4, 32) and ang.shape == (4, 32)
    assert len(mag_edges) == 33 and len(ang_edges) == 33
    assert perc_hi.shape == (4,)
    assert np.all(mag >= 1)  # +1 quirk


def test_calculate_3dhist_radlong_contract(rng):
    n, h, w = 12, 24, 24
    flow = rng.normal(size=(n, h, w, 2)).astype(np.float32)
    masks = np.zeros((n, h, w, 2), np.uint8)
    masks[:, 8:16, 8:16, :] = 1
    out = calculate_3dhist_radlong(flow, masks, n, nbins=20)
    for key in ("radial", "longitudinal"):
        freq, edges, hi, lo = out[key]
        assert freq.shape == (n, 20)
        assert len(edges) == 20  # the edges[:-1] quirk preserved
        assert hi.shape == (n,) and lo.shape == (n,)
        assert np.all(hi >= lo)
