"""Alias of reference optical_flow/api.py (analyze/plot/batch entry
points; reference api.py:20-131) -> tee_optical_flow_tpu.api."""

from tee_optical_flow_tpu.api import (  # noqa: F401
    analyze_optical_flow,
    analyze_radlong,
    batch_process,
    detect_cardiac_cycle,
    plot_results,
)

__all__ = ["analyze_optical_flow", "plot_results", "batch_process",
           "analyze_radlong", "detect_cardiac_cycle"]
