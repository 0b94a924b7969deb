"""Alias of reference optical_flow/optical_flow_utils.py (shared helpers;
reference optical_flow_utils.py:26-68) ->
tee_optical_flow_tpu.utils.helpers. The reference is star-imported
(example_peak_plots.py), so __all__ pins the same seven names."""

from tee_optical_flow_tpu.utils.helpers import (  # noqa: F401
    find_start_stop,
    fix_ecg,
    frame2time,
    img2uint8,
    index_smallest_positive,
    safe_makedir,
    timeinterval2index,
)

__all__ = ["safe_makedir", "img2uint8", "index_smallest_positive",
           "find_start_stop", "fix_ecg", "timeinterval2index",
           "frame2time"]
