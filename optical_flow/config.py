"""Alias of reference optical_flow/config.py (dataclass configs +
preset factories; reference config.py:12-193) ->
tee_optical_flow_tpu.config."""

from tee_optical_flow_tpu.config import (  # noqa: F401
    AnalysisConfig,
    CardiacCycleConfig,
    CardiacCycleMethodConfig,
    OpticalFlowCalculationConfig,
    PeakDetectionConfig,
    ProcessingConfig,
    VisualizationConfig,
    angle_detection_config,
    area_detection_config,
    arterial_gated_config,
    default_analysis_config,
    default_cardiac_cycle_config,
    default_optical_flow_config,
    default_peak_detection_config,
    default_processing_config,
    default_visualization_config,
    ecg_gated_config,
)

__all__ = [
    "CardiacCycleConfig", "VisualizationConfig", "ProcessingConfig",
    "PeakDetectionConfig", "AnalysisConfig", "CardiacCycleMethodConfig",
    "OpticalFlowCalculationConfig", "default_cardiac_cycle_config",
    "default_visualization_config", "default_processing_config",
    "default_peak_detection_config", "default_analysis_config",
    "default_optical_flow_config", "ecg_gated_config",
    "arterial_gated_config", "angle_detection_config",
    "area_detection_config",
]
