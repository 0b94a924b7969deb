from .helpers import (
    safe_makedir,
    img2uint8,
    index_smallest_positive,
    find_start_stop,
    timeinterval2index,
    frame2time,
    fix_ecg,
    pad_to_multiple,
    bucket_shape,
)
from .tracing import trace_stage, StageTimer, get_stage_report

__all__ = [
    "safe_makedir", "img2uint8", "index_smallest_positive", "find_start_stop",
    "timeinterval2index", "frame2time", "fix_ecg", "pad_to_multiple",
    "bucket_shape", "trace_stage", "StageTimer", "get_stage_report",
]
