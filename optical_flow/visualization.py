"""Alias of reference optical_flow/visualization.py (plots + overlay
video; reference visualization.py:30-1043) ->
tee_optical_flow_tpu.viz.manager."""

from tee_optical_flow_tpu.viz.manager import VisualizationManager  # noqa: F401

__all__ = ["VisualizationManager"]
