"""Viz manager artifacts + cohort batch pipeline on a synthetic gated clip."""

import os

import numpy as np
import pytest

from tee_optical_flow_tpu.api import analyze_optical_flow, detect_cardiac_cycle, plot_results
from tee_optical_flow_tpu.batch.cohort import analyze_cohort_file, run_cohort_analysis
from tee_optical_flow_tpu.batch.processor import BatchProcessor
from tee_optical_flow_tpu.config import AnalysisConfig, VisualizationConfig
from tee_optical_flow_tpu.dataset import OpticalFlowDataset
from tee_optical_flow_tpu.io.hdf5 import save_optical_flow_hdf5
from tee_optical_flow_tpu.viz.manager import VisualizationManager


def _gated_clip(tmp_path, n=40, h=24, w=24, frame_rate=20.0):
    """Clip with rv+av masks and a synthetic ECG/ABP pair (2 beats)."""
    rng = np.random.default_rng(5)
    flow = rng.normal(scale=0.5, size=(n, h, w, 2)).astype(np.float32)
    # periodic radial motion at 1 Hz (2 s clip, 2 beats)
    t = np.arange(n) / frame_rate
    flow[..., 1] += np.sin(2 * np.pi * 1.0 * t)[:, None, None]
    echo = rng.uniform(size=(n, h, w)).astype(np.float32)
    masks = {
        "rv": np.zeros((n, h, w, 2), np.uint8),
        "av": np.zeros((n, h, w, 2), np.uint8),
    }
    masks["rv"][:, 4:20, 4:20, :] = 1
    masks["av"][:, 10:14, 10:14, :] = 1

    # ECG: 500 Hz, 2 s, beats at 0.25/1.25 s; ABP 125 Hz
    ecg_t = np.arange(int(2.0 * 500)) / 500.0
    ecg = 0.05 * np.sin(2 * np.pi * 0.4 * ecg_t)
    for beat in (0.25, 1.25):
        c = int(beat * 500)
        ecg[c - 10:c + 11] += 1.2 * np.hanning(21)
    abp_t = np.arange(int(2.0 * 125)) / 125.0
    abp = 80 + 20 * np.sin(2 * np.pi * 1.0 * (abp_t - 0.3))

    meta = {"frame_rate": frame_rate, "pixel_spacing": 0.05,
            "R_wave_data_present": False}
    waveforms = {"ecg": (True, ecg), "art": (True, abp),
                 "cvp": (False, None), "pap": (False, None)}
    path = str(tmp_path / "gated.hdf5")
    save_optical_flow_hdf5(path, flow, echo, masks, meta, waveforms,
                           mode="RVIO_2class", no_saliency=True,
                           include_waveforms=True, patient_id="G1")
    return path


@pytest.fixture(scope="module")
def gated_clip(tmp_path_factory):
    return _gated_clip(tmp_path_factory.mktemp("cohort"))


def test_api_analyze_and_plot(gated_clip, tmp_path):
    with OpticalFlowDataset(gated_clip) as ds:
        out = analyze_optical_flow(ds, "velocity", "rv",
                                   analysis_config=AnalysisConfig(nbins=32))
        assert out["magnitude"].shape == (ds.nframes, 32)
        with pytest.raises(ValueError):
            analyze_optical_flow(ds, "velocity", "nope")
        p = str(tmp_path / "heat.png")
        plot_results(ds, "velocity", "rv", p,
                     analysis_config=AnalysisConfig(nbins=32))
        assert os.path.exists(p)


def test_api_detect_all_methods(gated_clip):
    with OpticalFlowDataset(gated_clip) as ds:
        for method in ("angle", "ecg_lazy", "arterial", "area"):
            ds.CARDIACCYCLE_CALCULATED = False
            if method == "angle":
                sys_f, dia_f = detect_cardiac_cycle(ds, method, label="rv")
            elif method == "area":
                sys_f, dia_f = detect_cardiac_cycle(ds, "area", label="rv")
            else:
                sys_f, dia_f = detect_cardiac_cycle(ds, method)
            assert isinstance(sys_f, list)


def test_viz_manager_artifacts(gated_clip, tmp_path):
    with OpticalFlowDataset(gated_clip) as ds:
        mgr = VisualizationManager(
            vis_config=VisualizationConfig(return_statistics=True))
        n = ds.nframes
        frame_times = np.arange(n) / ds.frame_rate
        rng = np.random.default_rng(0)

        # radlong heatmap with the edges[:-1] quirk input
        freq = rng.uniform(1, 10, size=(n, 16))
        edges_quirk = np.linspace(-2, 2, 16)  # nbins values, not nbins+1
        fig = mgr.plot_radlong_heatmap(
            freq, freq, edges_quirk, edges_quirk, frame_times * 1000,
            "velocity", "cm/s", str(tmp_path / "rl_heat.png"), nframes=n)
        assert os.path.exists(tmp_path / "rl_heat.png")

        # mag/angle heatmap
        mgr.plot_heatmap(freq, freq, np.linspace(0, 3, 17),
                         np.linspace(0, 2 * np.pi, 17), frame_times * 1000,
                         "velocity", "cm/s", str(tmp_path / "heat.png"), nframes=n)
        assert os.path.exists(tmp_path / "heat.png")

        # overlay video
        rad = rng.normal(size=(n, 24, 24)).astype(np.float32)
        out = mgr.visualize_radlong(ds.get_echo(), rad, -rad,
                                    str(tmp_path / "overlay.mp4"), nframes=n)
        # no ffmpeg in this image: manager falls back to GIF
        assert os.path.exists(out)

        # peak-line single: 9-tuple
        trace = np.sin(2 * np.pi * np.arange(n) / 20) + 1.5
        stats9 = mgr.plot_peak_line(
            trace, frame_times, [[2, 8], [22, 28]], [[9, 21], [29, 39]], n,
            "velocity", "cm/s", "rv", str(tmp_path / "line.png"),
            cc_method="ecg_lazy", return_statistics=True)
        assert len(stats9) == 9
        assert stats9[8] >= 1  # n_cycles

        # peak-line radlong: 18-tuple
        hi = trace
        lo = -trace
        stats18 = mgr.plot_peak_line_radlong(
            hi, lo, hi * 0.5, lo * 0.5, frame_times, [[2, 8], [22, 28]],
            [[9, 21], [29, 39]], n, "velocity", "cm/s", "rv",
            str(tmp_path / "rl_line.png"), cc_method="ecg_lazy",
            return_statistics=True)
        assert len(stats18) == 18
        assert stats18[16] >= 1 and stats18[17] >= 1


def test_cohort_gate_failure_zero_fills_only_that_gate(tmp_path):
    """Per-gate failure isolation through the hoisted data passes
    (batch/cohort.py round 3): a clip with ECG but no arterial trace must
    zero-fill the two arterial sections of the 69-value row while the ECG
    sections stay populated (reference analyze_optical_flow.py:1417-1470
    zero-fills per failed gate x analysis)."""
    rng = np.random.default_rng(5)
    n, h, w, frame_rate = 40, 24, 24, 20.0
    flow = rng.normal(scale=0.5, size=(n, h, w, 2)).astype(np.float32)
    t = np.arange(n) / frame_rate
    flow[..., 1] += np.sin(2 * np.pi * 1.0 * t)[:, None, None]
    echo = rng.uniform(size=(n, h, w)).astype(np.float32)
    masks = {"rv": np.zeros((n, h, w, 2), np.uint8),
             "av": np.zeros((n, h, w, 2), np.uint8)}
    masks["rv"][:, 4:20, 4:20, :] = 1
    masks["av"][:, 10:14, 10:14, :] = 1
    ecg_t = np.arange(int(2.0 * 500)) / 500.0
    ecg = 0.05 * np.sin(2 * np.pi * 0.4 * ecg_t)
    for beat in (0.25, 1.25):
        c = int(beat * 500)
        ecg[c - 10:c + 11] += 1.2 * np.hanning(21)
    meta = {"frame_rate": frame_rate, "pixel_spacing": 0.05,
            "R_wave_data_present": False}
    waveforms = {"ecg": (True, ecg), "art": (False, None),
                 "cvp": (False, None), "pap": (False, None)}
    path = str(tmp_path / "noart.hdf5")
    save_optical_flow_hdf5(path, flow, echo, masks, meta, waveforms,
                           mode="RVIO_2class", no_saliency=True,
                           include_waveforms=True, patient_id="G2")

    row = analyze_cohort_file(path, param="velocity", label="rv",
                              save_dir=str(tmp_path / "out"),
                              analysis_config=AnalysisConfig(nbins=32))
    assert len(row) == 69
    ecg_total = row[15:24]
    art_total = row[24:33]
    ecg_radlong = row[33:51]
    art_radlong = row[51:69]
    assert all(v == 0 for v in art_total), art_total
    assert all(v == 0 for v in art_radlong), art_radlong
    assert any(v != 0 for v in ecg_total), ecg_total
    assert any(v != 0 for v in ecg_radlong), ecg_radlong


def test_cohort_row_and_csv(gated_clip, tmp_path):
    save_dir = str(tmp_path / "cohort_out")
    row = analyze_cohort_file(gated_clip, param="velocity", label="rv",
                              save_dir=save_dir,
                              analysis_config=AnalysisConfig(nbins=32))
    assert len(row) == 69
    # the [:-4] filename convention keeps the trailing dot for .hdf5
    # inputs — reference optical_flow_dataset.py:50 behaves identically
    assert row[0] == "gated."
    assert row[2] == 20.0  # frame rate

    folder = os.path.dirname(gated_clip)
    errors = run_cohort_analysis(folder, save_dir, ["velocity"], ["rv"],
                                 nchunks=1, chunk_index=0, verbose=False)
    assert errors == []
    csv_path = os.path.join(save_dir, "csv", "rv_velocity_data.csv")
    assert os.path.exists(csv_path)
    import pandas as pd
    df = pd.read_csv(csv_path)
    assert df.shape == (1, 69)
    assert "ECGTotalPeakSystolicVelocity" in df.columns


def test_batch_processor_error_isolation(tmp_path):
    proc = BatchProcessor(str(tmp_path), verbose=False)

    def boom(path, **kw):
        raise RuntimeError("nope")

    out = proc.process_chunk(["a", "b"], boom)
    assert out == [] and proc.error_list == ["a", "b"]
    err_path = proc.save_errors()
    assert err_path and os.path.exists(err_path)
