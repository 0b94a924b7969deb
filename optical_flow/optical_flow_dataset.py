"""Alias of reference optical_flow/optical_flow_dataset.py (the
HDF5-backed clip object; reference optical_flow_dataset.py:29-228) ->
tee_optical_flow_tpu.dataset."""

from tee_optical_flow_tpu.dataset import OpticalFlowDataset  # noqa: F401

__all__ = ["OpticalFlowDataset"]
