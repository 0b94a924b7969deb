"""Alias of reference optical_flow/analyze_optical_flow.py (the legacy
cohort monolith; reference analyze_optical_flow.py:40-1620) ->
tee_optical_flow_tpu.legacy (a delegation shim over the same modern
modules the reference's wrappers delegate to)."""

from tee_optical_flow_tpu.legacy import (  # noqa: F401
    aggregate_pkl,
    analyze_hdf5_folder,
    percentile_plot,
    percentile_plot_radlong,
    sysdia_frames_by_RTime,
    sysdia_frames_by_angle,
    sysdia_frames_by_area,
    sysdia_frames_by_art,
    sysdia_frames_by_ecg,
    sysdia_frames_by_ecg_lazy,
)

__all__ = ["sysdia_frames_by_angle", "sysdia_frames_by_area",
           "sysdia_frames_by_RTime", "sysdia_frames_by_ecg_lazy",
           "sysdia_frames_by_ecg", "sysdia_frames_by_art",
           "percentile_plot", "percentile_plot_radlong",
           "analyze_hdf5_folder", "aggregate_pkl"]
