"""Alias of reference optical_flow/calculate_optical_flow.py (the DICOM
-> masks -> flow -> HDF5 production pipeline; reference
calculate_optical_flow.py:47-739) -> tee_optical_flow_tpu.flow.*.

Imports jax on first use — kept out of the package __init__ so analysis-
only user code stays light."""

from tee_optical_flow_tpu.flow.pipeline import (  # noqa: F401
    compute_clip_flow,
    extract_metadata,
    process_folder,
    process_video,
)
from tee_optical_flow_tpu.flow.segment import (  # noqa: F401
    clean_mask,
    predict_movie,
    predict_movie_thres,
)
from tee_optical_flow_tpu.ops import moving_avg_mask  # noqa: F401

__all__ = ["process_video", "process_folder", "compute_clip_flow",
           "extract_metadata", "predict_movie", "predict_movie_thres",
           "clean_mask", "moving_avg_mask"]
