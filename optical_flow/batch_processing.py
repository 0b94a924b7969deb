"""Alias of reference optical_flow/batch_processing.py (folder-scale
orchestration with error manifests; reference batch_processing.py:18-118)
-> tee_optical_flow_tpu.batch.processor."""

from tee_optical_flow_tpu.batch.processor import (  # noqa: F401
    BatchProcessor,
    analyze_hdf5_folder,
)

__all__ = ["BatchProcessor", "analyze_hdf5_folder"]
