"""Alias of reference optical_flow/peak_detection.py (S/e'/l'/a' peak
extraction; reference peak_detection.py:24-375) ->
tee_optical_flow_tpu.peak_detection."""

from tee_optical_flow_tpu.peak_detection import (  # noqa: F401
    PeakDetector,
    calculate_radlong_peaks,
    calculate_single_peaks,
)

__all__ = ["PeakDetector", "calculate_radlong_peaks",
           "calculate_single_peaks"]
