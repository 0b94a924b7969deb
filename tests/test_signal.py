"""Signal core tests: smoother behavior, peak-index semantics, baseline,
ECG R-peak detection on synthetic + real fixture traces."""

import numpy as np
import pytest

from tee_optical_flow_tpu.signal.smoother import spectral_smooth, spectral_smooth_jnp
from tee_optical_flow_tpu.signal.peaks import peak_indexes, poly_baseline
from tee_optical_flow_tpu.signal.ecg import detect_r_peaks, ecg_clean


def test_spectral_smooth_removes_noise_keeps_signal():
    t = np.linspace(0, 1, 200, endpoint=False)
    clean = np.sin(2 * np.pi * 3 * t)
    noisy = clean + 0.3 * np.sin(2 * np.pi * 60 * t)
    sm = spectral_smooth(noisy, smooth_fraction=0.2, pad_len=20)
    assert sm.shape == noisy.shape
    # interior error should be much smaller than the injected noise
    err = np.abs(sm[20:-20] - clean[20:-20])
    assert err.mean() < 0.08


def test_spectral_smooth_jnp_matches_numpy():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 128))
    a = spectral_smooth(x, smooth_fraction=0.3, pad_len=10)
    b = np.asarray(spectral_smooth_jnp(x, smooth_fraction=0.3, pad_len=10))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_peak_indexes_basic():
    y = np.zeros(100)
    for c in (10, 50, 90):
        y[c - 3:c + 4] = np.hanning(7)
    idx = peak_indexes(y, thres=0.3, min_dist=5)
    assert list(idx) == [10, 50, 90]


def test_peak_indexes_min_dist_keeps_tallest():
    y = np.zeros(60)
    y[20] = 1.0
    y[24] = 2.0  # taller, within min_dist of the first
    # make strict local maxima
    y[19] = y[21] = 0.5
    y[23] = y[25] = 0.5
    idx = peak_indexes(y, thres=0.1, min_dist=10)
    assert list(idx) == [24]


def test_peak_indexes_normalized_threshold():
    y = np.zeros(50)
    y[10 - 2:10 + 3] = np.hanning(5) * 1.0   # big peak
    y[30 - 2:30 + 3] = np.hanning(5) * 0.2   # small peak
    # thres=0.5 normalized -> cutoff at 0.5*(1-0)+0 = 0.5 -> drops small peak
    assert list(peak_indexes(y, thres=0.5, min_dist=3)) == [10]
    assert list(peak_indexes(y, thres=0.05, min_dist=3)) == [10, 30]


def test_peak_indexes_flat_and_plateau():
    assert peak_indexes(np.ones(30)).size == 0
    y = np.zeros(30)
    y[10:13] = 1.0  # plateau peak
    idx = peak_indexes(y, thres=0.3, min_dist=1)
    assert idx.size == 1 and 10 <= idx[0] <= 12


def test_poly_baseline_recovers_slow_floor():
    x = np.linspace(0, 1, 300)
    floor = 2.0 + 0.8 * x + 0.5 * x ** 2
    y = floor.copy()
    for c in (60, 150, 240):
        y[c - 5:c + 6] += 3 * np.hanning(11)
    base = poly_baseline(y, deg=2)
    assert np.abs(base - floor).mean() < 0.25


def _synthetic_ecg(sampling_rate=500, beats=6, rr_s=0.8, rng=None):
    n = int(beats * rr_s * sampling_rate)
    t = np.arange(n) / sampling_rate
    ecg = 0.05 * np.sin(2 * np.pi * 0.3 * t)  # baseline wander
    r_locs = []
    qrs_w = int(0.02 * sampling_rate)
    for b in range(beats):
        c = int((b + 0.5) * rr_s * sampling_rate)
        if c + 3 * qrs_w >= n:
            break
        ecg[c - qrs_w:c + qrs_w + 1] += 1.2 * np.hanning(2 * qrs_w + 1)  # R
        tc = c + int(0.25 * sampling_rate)  # T wave
        tw = int(0.06 * sampling_rate)
        if tc + tw < n:
            ecg[tc - tw:tc + tw + 1] += 0.3 * np.hanning(2 * tw + 1)
        r_locs.append(c)
    if rng is not None:
        ecg += 0.02 * rng.normal(size=n)
    return ecg, np.array(r_locs)


def test_r_peak_detection_synthetic(rng):
    ecg, truth = _synthetic_ecg(rng=rng)
    peaks = detect_r_peaks(ecg, 500)
    assert peaks.size == truth.size
    # every detected peak within 30 ms of a true R
    assert np.all(np.min(np.abs(peaks[:, None] - truth[None, :]), axis=1) < 15)


def test_r_peak_detection_fixture(waveform_dir):
    ecg = np.load(f"{waveform_dir}/stanford_RVIO_49_2_II.npy")
    peaks = detect_r_peaks(ecg, 500)
    # 2.36 s of OR ECG: expect 2-5 beats with plausible RR intervals
    assert 2 <= peaks.size <= 5
    rr = np.diff(peaks) / 500.0
    assert np.all(rr > 0.3) and np.all(rr < 2.0)


def test_ecg_clean_removes_baseline_wander():
    t = np.arange(1000) / 500.0
    wander = 0.5 * np.sin(2 * np.pi * 0.3 * t)
    cleaned = ecg_clean(wander, 500)
    assert np.abs(cleaned).max() < 0.05


def test_r_peak_detection_flat_lead():
    """A disconnected/flat lead must yield zero beats, not a crash or
    spurious detections (the reference's neurokit2 path handled this
    implicitly; weak-item coverage)."""
    for trace in (np.zeros(1200), np.full(1200, 3.7),
                  np.linspace(0.0, 0.01, 1200)):  # DC offset / slow drift
        peaks = detect_r_peaks(trace, 500)
        assert peaks.size == 0, peaks


def test_r_peak_detection_survives_extreme_wander(rng):
    """A lead dominated by baseline wander (in-band energy ~0.3% of the
    total RMS — under the round-2 guard's 1% cut) must still yield the
    beats the cleaner isolates; the flat-lead guard only rejects true
    filter residue (ADVICE round 2, signal/ecg.py guard threshold)."""
    ecg, truth = _synthetic_ecg(rng=rng)
    t = np.arange(ecg.size) / 500.0
    wander = 60.0 * np.abs(ecg).max() * np.sin(2 * np.pi * 0.25 * t)
    peaks = detect_r_peaks(ecg + wander, 500)
    assert peaks.size == truth.size
    assert np.all(np.min(np.abs(peaks[:, None] - truth[None, :]), axis=1) < 15)


def test_r_peak_detection_inverted_qrs(rng):
    """Lead inversion (negative R deflections) must find the same beats:
    the detector squares the derivative and refines on |amplitude|."""
    ecg, truth = _synthetic_ecg(rng=rng)
    peaks = detect_r_peaks(-ecg, 500)
    assert peaks.size == truth.size
    assert np.all(np.min(np.abs(peaks[:, None] - truth[None, :]), axis=1) < 15)


def test_r_peak_detection_short_trace():
    """Traces shorter than a QRS window return empty without touching the
    filter (filtfilt would raise on padlen >= n)."""
    assert detect_r_peaks(np.zeros(10), 500).size == 0
    assert detect_r_peaks(np.array([]), 500).size == 0
