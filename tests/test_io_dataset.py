"""io + dataset round-trip tests: HDF5 schema, waveform validation, dataset
semantics (the nframes-2 convention, derived accel/PWR, masked getters)."""

import numpy as np
import pytest

from tee_optical_flow_tpu.config import OpticalFlowCalculationConfig, PipelineConfig
from tee_optical_flow_tpu.dataset import OpticalFlowDataset
from tee_optical_flow_tpu.io.hdf5 import HDF5Reader, HDF5Writer, save_optical_flow_hdf5
from tee_optical_flow_tpu.io.waveforms import is_flat, load_all_waveforms
from tee_optical_flow_tpu.io.tabular import cohort_csv_header


def _write_clip(tmp_path, n=6, h=16, w=16, include_waveforms=True):
    rng = np.random.default_rng(1)
    flow = rng.normal(size=(n, h, w, 2)).astype(np.float32)
    echo = rng.uniform(size=(n, h, w)).astype(np.float32)
    masks = {
        "rv_inner": (rng.uniform(size=(n, h, w, 2)) > 0.5).astype(np.uint8),
        "av": (rng.uniform(size=(n, h, w, 2)) > 0.8).astype(np.uint8),
    }
    waveforms = {
        "ecg": (True, rng.normal(size=300)),
        "art": (True, 80 + 10 * np.sin(np.linspace(0, 20, 295))),
        "cvp": (False, None),
        "pap": (False, None),
    }
    meta = {"frame_rate": 30.0, "pixel_spacing": 0.05,
            "R_wave_data_present": True, "R_times": np.array([10.0, 800.0])}
    path = str(tmp_path / "clip.hdf5")
    save_optical_flow_hdf5(
        path, flow, echo, masks, meta, waveforms,
        mode="RVIO_2class", no_saliency=True,
        include_waveforms=include_waveforms, patient_id="P1", heart_rate=72,
    )
    return path, flow, echo, masks


def test_hdf5_schema_roundtrip(tmp_path):
    path, flow, echo, masks = _write_clip(tmp_path)
    with HDF5Reader(path) as f:
        assert set(["echo", "flow", "ecg", "art", "RWaveTime", "rv_inner", "av"]) <= set(f)
        attrs = dict(f["flow"].attrs)
        assert attrs["nframes"] == 6
        assert attrs["units_converted"]
        assert attrs["waveforms_present"]
        assert list(attrs["labels"]) == ["rv_inner", "av"]
        assert f["flow"].dtype == np.float16
        assert f["ecg"].attrs["sampling_rate"] == 500
        assert not attrs["CVP_exists"] and not attrs["PAP_exists"]


def test_dataset_semantics(tmp_path):
    path, flow, echo, masks = _write_clip(tmp_path)
    with OpticalFlowDataset(path) as ds:
        # the -2 convention (reference optical_flow_dataset.py:58)
        assert ds.nframes == 4
        assert ds.frame_rate == 30.0
        assert ds.vel_array.dtype == np.float32
        # accel = gradient along frame axis at dt = 1/frame_rate
        expected_accel = np.gradient(ds.vel_array, 1 / 30.0, axis=0)
        np.testing.assert_allclose(ds.accel_array, expected_accel)
        np.testing.assert_allclose(ds.pwr_array, ds.vel_array * ds.accel_array)
        # masked getter multiplies by mask
        mv = ds.get_velocity("rv_inner")
        np.testing.assert_allclose(mv, ds.vel_array * ds.get_mask("rv_inner"))
        assert ds.get_masked_arr("PWR", "av") is not None
        assert ds.get_masked_arr("velocity", "nope") is None
        assert ds._param_unit("velocity") == "cm/s"
        assert ds.RTimePresent


def test_dataset_lazy_mode(tmp_path):
    path, flow, echo, masks = _write_clip(tmp_path)
    with OpticalFlowDataset(path, keep_file_open=True) as ds:
        assert ds.get_echo() is not None
        assert ds.get_mask("av").shape == masks["av"].shape
    # closed after exit
    assert ds._closed


def test_waveform_fixture_validation(waveform_dir):
    """The shipped Stanford fixtures exercise the real validation paths:
    ART is flat -> ABP fallback; CVP/PAP means out of physiological range."""
    cfg = OpticalFlowCalculationConfig()
    res = load_all_waveforms("stanford_RVIO_49_2.dcm", waveform_dir, cfg, verbose=True)
    assert res["ecg"][0] and res["ecg"][1].shape == (1179,)
    # ART fixture is flat (range ~199-202) so the ABP trace must be used
    assert res["art"][0]
    assert res["art"][1].max() > 110  # ABP trace, not the flat ART
    assert not res["cvp"][0]  # mean ~286 out of [-10, 50]
    assert not res["pap"][0]  # mean ~273 > 100


def test_flatness_predicate():
    assert is_flat(np.full(100, 5.0), 0.05)
    assert not is_flat(np.sin(np.linspace(0, 30, 100)), 0.05)


def test_cohort_header_has_69_columns():
    hdr = cohort_csv_header("velocity")
    assert len(hdr) == 69
    assert hdr[0] == "Filename"
    assert "ECGTotalPeakSystolicVelocity" in hdr
    assert "ARTLongCardiacCyclesVelocity" in hdr


def test_config_json_roundtrip(tmp_path):
    cfg = PipelineConfig()
    cfg.flow.lambda_value = 0.2
    cfg.mode = "A4C"
    path = str(tmp_path / "cfg.json")
    cfg.to_json(path)
    loaded = PipelineConfig.from_json(path)
    assert loaded.flow.lambda_value == 0.2
    assert loaded.mode == "A4C"
    assert loaded.device.frame_bucket == cfg.device.frame_bucket


def test_config_validation():
    from tee_optical_flow_tpu.config import validate_pipeline_config
    from tee_optical_flow_tpu.exceptions import ConfigurationError
    cfg = PipelineConfig(mode="bogus")
    with pytest.raises(ConfigurationError):
        validate_pipeline_config(cfg)


def test_config_retired_key_fails_loudly():
    """A persisted round-4 ``deepflow_iterations`` (total damped-Jacobi
    iterations) must not be silently ignored or silently reinterpreted
    as SOR sweeps (round-5 review): from_json raises with migration
    guidance, while genuinely unknown keys stay forward-compatible."""
    from tee_optical_flow_tpu.config import OpticalFlowCalculationConfig
    from tee_optical_flow_tpu.exceptions import ConfigurationError

    ok = OpticalFlowCalculationConfig.from_json(
        '{"deepflow_sor_iterations": 7, "some_future_key": 1}')
    assert ok.deepflow_sor_iterations == 7
    with pytest.raises(ConfigurationError, match="deepflow_sor_iterations"):
        OpticalFlowCalculationConfig.from_json(
            '{"deepflow_iterations": 25}')
