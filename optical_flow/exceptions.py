"""Alias of reference optical_flow/exceptions.py (error hierarchy;
reference exceptions.py:6-33) -> tee_optical_flow_tpu.exceptions."""

from tee_optical_flow_tpu.exceptions import (  # noqa: F401
    ConfigurationError,
    DICOMReadError,
    OpticalFlowCalculationError,
    OpticalFlowError,
    WaveformLoadError,
    WaveformValidationError,
)

__all__ = ["OpticalFlowError", "DICOMReadError", "WaveformLoadError",
           "WaveformValidationError", "OpticalFlowCalculationError",
           "ConfigurationError"]
