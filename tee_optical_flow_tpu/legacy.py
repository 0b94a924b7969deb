"""Backward-compatibility surface for the reference's legacy monolith.

The reference keeps a 1,620-line ``analyze_optical_flow.py`` whose
functions wrap the detector classes and duplicate the analysis/plot code
paths (reference analyze_optical_flow.py:102-199, :1361-1620). Users
migrating from it get the same names here, each delegating to the new
stack. New code should import from the real modules instead.
"""

from __future__ import annotations

from typing import List, Optional

from .analysis import (
    calc_bidirectional_hist, calculate_3dhist, calculate_3dhist_radlong,
)
from .batch.cohort import run_cohort_analysis
from .config import CardiacCycleConfig, ProcessingConfig
from .io.tabular import aggregate_pkl_files as aggregate_pkl
from .signal.cycles import (
    AngleDetector, AreaDetector, ArterialDetector, ECGDetector,
    ECGLazyDetector, RTimeDetector,
)
from .viz.manager import VisualizationManager

__all__ = [
    "sysdia_frames_by_angle", "sysdia_frames_by_area",
    "sysdia_frames_by_RTime", "sysdia_frames_by_ecg_lazy",
    "sysdia_frames_by_ecg", "sysdia_frames_by_art",
    "calculate_3dhist", "calculate_3dhist_radlong", "calc_bidirectional_hist",
    "percentile_plot", "percentile_plot_radlong",
    "analyze_hdf5_folder", "aggregate_pkl",
]


def _cc(smooth_fraction=0.2, pad_len=20, **kw) -> CardiacCycleConfig:
    cfg = CardiacCycleConfig(smooth_fraction=smooth_fraction, pad_len=pad_len)
    for k, v in kw.items():
        if hasattr(cfg, k):
            setattr(cfg, k, v)
    return cfg


def sysdia_frames_by_angle(ds, param="velocity", label="rv_inner", **kw):
    """(reference analyze_optical_flow.py:102-118)."""
    return AngleDetector(_cc(**kw), None, ProcessingConfig()).detect(ds, param, label)


def sysdia_frames_by_area(ds, label="rv_inner", **kw):
    return AreaDetector(_cc(**kw), None, ProcessingConfig()).detect(ds, label)


def sysdia_frames_by_RTime(ds, **kw):
    return RTimeDetector(_cc(**kw), None, ProcessingConfig()).detect(ds)


def sysdia_frames_by_ecg_lazy(ds, ecg_arr, sampling_rate=500, **kw):
    return ECGLazyDetector(_cc(**kw), None, ProcessingConfig()).detect(
        ds, ecg_arr, sampling_rate)


def sysdia_frames_by_ecg(ds, ecg_arr, sampling_rate=500, **kw):
    return ECGDetector(_cc(**kw), None, ProcessingConfig()).detect(
        ds, ecg_arr, sampling_rate)


def sysdia_frames_by_art(ds, art_arr, sampling_rate=125, **kw):
    return ArterialDetector(_cc(**kw), None, ProcessingConfig()).detect(
        ds, art_arr, sampling_rate)


def percentile_plot(ds, param="velocity", label="rv", cc_method="ecg_lazy",
                    save_dir=".", **kw):
    """Legacy 9-tuple entry point (reference :1120-1359): total-magnitude
    percentile trace -> peak statistics."""
    from .batch.cohort import _detect, _total_stats
    from .config import AnalysisConfig, VisualizationConfig

    manager = VisualizationManager(
        vis_config=VisualizationConfig(return_statistics=True))
    gate = "ecg" if "ecg" in cc_method else "art"
    sys_f, dia_f = _detect(ds, gate, _cc(**kw), ProcessingConfig())
    return _total_stats(ds, param, label, cc_method, sys_f, dia_f, manager,
                        AnalysisConfig(), save_dir)


def percentile_plot_radlong(ds, param="velocity", label="rv",
                            cc_method="ecg_lazy", save_dir=".", **kw):
    """Legacy 18-tuple entry point (reference :660-906)."""
    from .batch.cohort import _detect, _radlong_stats
    from .config import AnalysisConfig, VisualizationConfig

    manager = VisualizationManager(
        vis_config=VisualizationConfig(return_statistics=True))
    gate = "ecg" if "ecg" in cc_method else "art"
    sys_f, dia_f = _detect(ds, gate, _cc(**kw), ProcessingConfig())
    return _radlong_stats(ds, param, label, cc_method, sys_f, dia_f, manager,
                          AnalysisConfig(), save_dir)


def analyze_hdf5_folder(folder: str, save_dir: str,
                        param_list: Optional[List[str]] = None,
                        label_list: Optional[List[str]] = None,
                        nchunks: int = 1, chunk_index: int = 0,
                        recalculate: bool = False, verbose: bool = True):
    """Legacy cohort loop (reference :1361-1516)."""
    return run_cohort_analysis(folder, save_dir, param_list, label_list,
                               nchunks=nchunks, chunk_index=chunk_index,
                               recalculate=recalculate, verbose=verbose)
