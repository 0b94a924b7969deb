"""Alias of reference optical_flow/cardiac_cycle_detection.py (the six
systole/diastole detectors + factory; reference :34-526) ->
tee_optical_flow_tpu.signal.cycles."""

from tee_optical_flow_tpu.signal.cycles import (  # noqa: F401
    AngleDetector,
    AreaDetector,
    ArterialDetector,
    CardiacCycleDetector,
    ECGDetector,
    ECGLazyDetector,
    RTimeDetector,
    create_detector,
)

__all__ = ["CardiacCycleDetector", "AngleDetector", "AreaDetector",
           "RTimeDetector", "ECGLazyDetector", "ECGDetector",
           "ArterialDetector", "create_detector"]
