"""The ``optical_flow`` drop-in alias package: reference user code's
import lines must run unchanged (reference optical_flow/api.py:20,
example_peak_plots.py:24-40, analyze_optical_flow.py imports)."""

import importlib

import numpy as np
import pytest

# the reference codebase's own import lines, verbatim (grep of
# /root/reference for '^from optical_flow'), deduplicated
REFERENCE_IMPORT_LINES = [
    "from optical_flow.analysis import calculate_3dhist, calculate_3dhist_radlong",
    "from optical_flow.cardiac_cycle_detection import create_detector",
    "from optical_flow.config import AnalysisConfig",
    "from optical_flow.config import CardiacCycleConfig, VisualizationConfig, ProcessingConfig",
    "from optical_flow.config import OpticalFlowCalculationConfig, default_optical_flow_config",
    "from optical_flow.config import PeakDetectionConfig, CardiacCycleConfig",
    "from optical_flow.config import (CardiacCycleConfig, VisualizationConfig, ProcessingConfig, "
    "AnalysisConfig, CardiacCycleMethodConfig, default_cardiac_cycle_config, "
    "default_visualization_config, default_processing_config, default_analysis_config, "
    "ecg_gated_config, arterial_gated_config)",
    "from optical_flow.exceptions import DICOMReadError, OpticalFlowCalculationError, ConfigurationError",
    "from optical_flow.file_io import PickleSerializer",
    "from optical_flow.optical_flow_dataset import OpticalFlowDataset",
    "from optical_flow.optical_flow_utils import *",
    "from optical_flow.optical_flow_utils import safe_makedir",
    "from optical_flow.optical_flow_utils import safe_makedir, find_start_stop, "
    "timeinterval2index, frame2time, index_smallest_positive",
    "from optical_flow.optical_flow_utils import safe_makedir, fix_ecg",
    "from optical_flow.peak_detection import calculate_radlong_peaks",
    "from optical_flow.peak_detection import calculate_radlong_peaks, calculate_single_peaks",
    "from optical_flow.plotting_utils import (add_systole_diastole_shading, "
    "plot_waveform_with_shading, create_heatmap_figure, setup_colorbar, annotate_peaks)",
    "from optical_flow.visualization import VisualizationManager",
    "from optical_flow.waveform_loader import load_all_waveforms",
    # reference api.py's own entry points
    "from optical_flow.api import analyze_optical_flow, plot_results, batch_process",
]


@pytest.mark.parametrize("line", REFERENCE_IMPORT_LINES,
                         ids=lambda s: s[:60])
def test_reference_import_line_runs_unchanged(line):
    exec(line, {})


def test_alias_submodules_importable():
    for mod in ("optical_flow", "optical_flow.api", "optical_flow.analysis",
                "optical_flow.batch_processing", "optical_flow.cache",
                "optical_flow.cardiac_cycle_detection", "optical_flow.config",
                "optical_flow.exceptions", "optical_flow.file_io",
                "optical_flow.optical_flow_dataset",
                "optical_flow.optical_flow_utils",
                "optical_flow.peak_detection", "optical_flow.plotting_utils",
                "optical_flow.visualization", "optical_flow.waveform_loader",
                "optical_flow.analyze_optical_flow",
                "optical_flow.calculate_optical_flow"):
        importlib.import_module(mod)


def test_alias_objects_are_the_real_ones():
    """The alias must re-export, not wrap: identity with the real
    package's objects, so isinstance/except clauses interoperate."""
    import optical_flow.config as alias_cfg
    import optical_flow.exceptions as alias_exc
    from optical_flow.optical_flow_dataset import OpticalFlowDataset as A

    import tee_optical_flow_tpu.config as real_cfg
    import tee_optical_flow_tpu.exceptions as real_exc
    from tee_optical_flow_tpu.dataset import OpticalFlowDataset as B

    assert A is B
    assert alias_cfg.CardiacCycleConfig is real_cfg.CardiacCycleConfig
    assert alias_exc.OpticalFlowError is real_exc.OpticalFlowError


def test_alias_works_end_to_end(tmp_path):
    """A reference-style user script against the alias surface: load an
    HDF5 through the alias dataset, run a detector from the alias
    factory, call the alias helpers."""
    from optical_flow.cardiac_cycle_detection import create_detector
    from optical_flow.optical_flow_dataset import OpticalFlowDataset
    from optical_flow.optical_flow_utils import frame2time, safe_makedir

    from tee_optical_flow_tpu.io.hdf5 import save_optical_flow_hdf5

    n, h, w = 12, 24, 32
    rng = np.random.default_rng(0)
    flow = rng.normal(size=(n, h, w, 2)).astype(np.float32)
    echo = rng.uniform(0, 255, size=(n, h, w)).astype(np.float32)
    masks = {"rv": np.ones((n, h, w, 2), np.uint8)}
    meta = {"frame_rate": 30.0, "pixel_spacing": 0.05,
            "R_wave_data_present": False, "nframes": n}
    waveforms = {"ecg": (False, None), "art": (False, None),
                 "cvp": (False, None), "pap": (False, None)}
    path = str(tmp_path / "alias.hdf5")
    save_optical_flow_hdf5(path, flow, echo, masks, meta, waveforms,
                           mode="RVIO_2class", no_saliency=True,
                           include_waveforms=False, patient_id="T",
                           heart_rate=60)

    with OpticalFlowDataset(path) as ds:
        assert ds.nframes == n - 2
        det = create_detector("angle")
        sys_frames, dia_frames = det.detect(ds, "velocity", "rv")
        assert len(sys_frames) + len(dia_frames) > 0

    out = tmp_path / "made"
    safe_makedir(str(out))
    assert out.exists()
    assert frame2time([[0, 30]], 30.0)[0][1] == pytest.approx(1.0)
