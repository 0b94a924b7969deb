"""Cycle detectors + S/e'/l'/a' peak extraction on synthetic clips and the
real fixture waveforms."""

import numpy as np
import pytest

from tee_optical_flow_tpu.config import CardiacCycleConfig, ProcessingConfig
from tee_optical_flow_tpu.peak_detection import (
    calculate_radlong_peaks, calculate_single_peaks,
)
from tee_optical_flow_tpu.signal.cycles import (
    AngleDetector, AreaDetector, ArterialDetector, ECGDetector,
    ECGLazyDetector, RTimeDetector, angle_mode_series, create_detector,
)


class FakeDS:
    """Minimal stand-in exposing the attributes detectors read."""

    def __init__(self, nframes, frame_rate=30.0, masked=None, masks=None,
                 rwaves=None):
        self.nframes = nframes
        self.frame_rate = frame_rate
        self.filename = "fake"
        self.CARDIACCYCLE_CALCULATED = False
        self._masked = masked
        self._masks = masks or {}
        self.RTimePresent = rwaves is not None
        if rwaves is not None:
            self.RWaveTimes = np.asarray(rwaves)

    def get_masked_arr(self, param, label):
        return self._masked

    def get_mask(self, label):
        return self._masks[label]

    @property
    def mask_ds_dict(self):
        return self._masks


def test_angle_mode_series_known_direction():
    n, h, w = 4, 8, 8
    flow = np.zeros((n, h, w, 2), np.float32)
    flow[0, ..., 0] = 1.0   # angle 0 -> but 0 excluded? bucket = 0 -> excluded as 'zero'
    flow[0, ..., 1] = 1.0   # 45 deg -> 0.79 rad
    flow[1, ..., 0] = -1.0  # pi
    flow[2, ..., 1] = -1.0  # 3pi/2
    flow[3, ..., 0] = 1.0
    flow[3, ..., 1] = -1.0  # 7pi/4
    modes = np.asarray(angle_mode_series(flow))
    np.testing.assert_allclose(modes, [np.pi / 4, np.pi, 3 * np.pi / 2, 7 * np.pi / 4],
                               atol=0.01)


def test_angle_detector_splits_at_pi():
    n, h, w = 24, 8, 8
    flow = np.zeros((n, h, w, 2), np.float32)
    # frames 0-11 move at pi/2 (up phase < pi), 12-23 at 3pi/2 (>= pi)
    flow[:12, ..., 1] = 1.0
    flow[12:, ..., 1] = -1.0
    ds = FakeDS(n, masked=flow)
    det = AngleDetector(CardiacCycleConfig(smooth_fraction=0.9, pad_len=4))
    sys_frames, dia_frames = det.detect(ds, "velocity", "rv")
    assert ds.CARDIACCYCLE_CALCULATED
    assert len(sys_frames) >= 1 and len(dia_frames) >= 1
    # the systole block must cover the early frames, diastole the late ones
    assert sys_frames[0][0] == 0
    assert dia_frames[-1][1] == n - 1


def test_area_detector_oscillating_mask():
    n, h, w = 40, 32, 32
    masks = np.zeros((n, h, w, 2), np.uint8)
    for i in range(n):
        r = 8 + int(5 * np.sin(2 * np.pi * i / 20))  # two cycles
        masks[i, 16 - r // 2:16 + r // 2, 16 - r // 2:16 + r // 2, :] = 1
    ds = FakeDS(n, masks={"rv_inner": masks})
    det = AreaDetector(CardiacCycleConfig(smooth_fraction=0.5, pad_len=5,
                                          sys_thres=0.5, dia_thres=0.5))
    sys_frames, dia_frames = det.detect(ds, "rv_inner")
    assert len(sys_frames) >= 1
    for end_dia, end_sys in sys_frames:
        assert end_dia < end_sys  # systole runs peak-area -> trough-area


def test_rtime_detector():
    ds = FakeDS(30, frame_rate=30.0, rwaves=[0.0, 500.0])
    det = RTimeDetector(CardiacCycleConfig(rr_sys_ratio=0.333))
    sys_frames, dia_frames = det.detect(ds)
    assert len(sys_frames) == 1 and len(dia_frames) == 1
    # 0-166.5ms at 33.3ms/frame -> frames 0..4 systole
    assert sys_frames[0] == [0, 4]
    assert dia_frames[0][1] == 14  # 500 ms -> frame 15 excluded at 500.0? frame 15 = 500.1ms


def test_rtime_detector_missing_metadata():
    ds = FakeDS(10)
    det = RTimeDetector()
    assert det.detect(ds) == ([], [])


def test_ecg_lazy_detector_fixture(waveform_dir):
    ecg = np.load(f"{waveform_dir}/stanford_RVIO_49_2_II.npy")
    # 2.36 s clip at 30 fps -> ~70 frames
    ds = FakeDS(70, frame_rate=30.0)
    det = ECGLazyDetector(CardiacCycleConfig())
    sys_frames, dia_frames = det.detect(ds, ecg, 500)
    assert 1 <= len(sys_frames) <= 4
    for s in sys_frames:
        assert 0 <= s[0] <= s[1] < 70
    # diastole follows systole within each RR
    assert len(dia_frames) == len(sys_frames)


def test_ecg_detector_fixture(waveform_dir):
    ecg = np.load(f"{waveform_dir}/stanford_RVIO_49_2_II.npy")
    ds = FakeDS(70, frame_rate=30.0)
    det = ECGDetector(CardiacCycleConfig())
    sys_frames, dia_frames = det.detect(ds, ecg, 500)
    # T-wave search may or may not find candidates per beat, but intervals
    # must be well-formed when present
    for s in sys_frames:
        assert s[0] <= s[1]


def test_arterial_detector_fixture(waveform_dir):
    abp = np.load(f"{waveform_dir}/stanford_RVIO_49_2_ABP.npy")
    ds = FakeDS(70, frame_rate=30.0)
    det = ArterialDetector(CardiacCycleConfig())
    sys_frames, dia_frames = det.detect(ds, abp, 125)
    assert len(sys_frames) >= 1
    for s in sys_frames:
        assert 0 <= s[0] <= s[1] < 70


def test_detector_skip_when_calculated():
    ds = FakeDS(10)
    ds.CARDIACCYCLE_CALCULATED = True
    ds.sys_frames = [[1, 2]]
    ds.dia_frames = [[3, 4]]
    det = RTimeDetector(proc_config=ProcessingConfig(recalculate=False))
    assert det.detect(ds) == ([[1, 2]], [[3, 4]])


def test_create_detector_factory():
    for m in ("angle", "area", "ecg", "ecg_lazy", "metadata", "arterial"):
        assert create_detector(m) is not None
    with pytest.raises(ValueError):
        create_detector("bogus")


# ---------------------------------------------------------------------------
# peak detection
# ---------------------------------------------------------------------------

def _trace(n=60):
    """lo dips in systole, hi bumps in diastole thirds."""
    t = np.arange(n, dtype=float)
    lo = np.zeros(n)
    hi = np.zeros(n)
    lo[8:13] = -np.hanning(5) * 3          # systolic dip at 10
    hi[24:29] = np.hanning(5) * 2.0        # e' at 26
    hi[36:41] = np.hanning(5) * 1.0        # l' at 38
    hi[48:53] = np.hanning(5) * 1.5        # a' at 50
    return t, hi, lo


def test_calculate_radlong_peaks_known_windows():
    t, hi, lo = _trace()
    sys_frames = [(5, 18)]
    dia_frames = [(20, 56)]
    out = calculate_radlong_peaks(hi, lo, t, sys_frames, dia_frames, 60,
                                  cc_method="ecg", smooth_fraction=0.9,
                                  pad_len=5, peak_thres=0.2, min_dist=3,
                                  pick_peak_by_subset=True)
    assert abs(out["sys_px"][0] - 10) <= 2
    assert abs(out["e_px"][0] - 26) <= 2
    assert abs(out["l_px"][0] - 38) <= 2
    assert abs(out["a_px"][0] - 50) <= 2
    assert out["true_sys"] == [[5, 18]]
    assert out["true_dia"] == [(20, 56)]


def test_calculate_single_peaks_angle_complement():
    t = np.arange(60, dtype=float)
    arr = np.zeros(60)
    arr[8:13] = np.hanning(5) * 3     # systolic max at 10
    arr[30:35] = np.hanning(5) * 2    # diastolic activity
    sys_frames = [(5, 18)]
    out = calculate_single_peaks(arr, t, sys_frames, [], 60,
                                 cc_method="angle", peak_thres=0.2,
                                 min_dist=3, pick_peak_by_subset=True)
    assert abs(out["sys_px"][0] - 10) <= 1
    # complement diastole: [0,4] head and [18,59] tail
    assert out["true_dia"][0] == [0, 4]
    assert out["true_dia"][1] == [18, 59]


def test_calculate_single_peaks_show_all():
    t, hi, lo = _trace()
    out = calculate_single_peaks(hi, t, [(0, 10)], [(20, 56)], 60,
                                 cc_method="ecg", peak_thres=0.1, min_dist=3,
                                 pick_peak_by_subset=True, show_all_peaks=True)
    assert "all_px" in out and len(out["all_px"]) >= 3


@pytest.mark.parametrize("det_cls", [ECGLazyDetector, ECGDetector])
def test_ecg_detectors_flat_lead_degrade_gracefully(det_cls):
    """A flat ECG lead (zero R-peaks) must produce empty interval lists,
    set the calculated flag, and not raise (pathological-trace coverage)."""
    ds = FakeDS(24)
    det = det_cls(CardiacCycleConfig())
    sys_frames, dia_frames = det.detect(ds, np.zeros(1200), 500)
    assert sys_frames == [] and dia_frames == []
    assert ds.CARDIACCYCLE_CALCULATED


def test_ecg_lazy_detector_inverted_lead():
    """An inverted lead still segments the clip into plausible intervals."""
    from tests.test_signal import _synthetic_ecg

    ecg, _ = _synthetic_ecg()
    ds = FakeDS(48, frame_rate=20.0)
    det = ECGLazyDetector(CardiacCycleConfig())
    sys_frames, dia_frames = det.detect(ds, -ecg, 500)
    assert len(sys_frames) >= 1 and len(dia_frames) >= 1
    for s in sys_frames:
        assert 0 <= s[0] <= s[1] <= ds.nframes - 1
