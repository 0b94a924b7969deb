"""Alias of reference optical_flow/waveform_loader.py (ECG/ART/CVP/PAP
companion loading + physiological validation; reference
waveform_loader.py:14-184) -> tee_optical_flow_tpu.io.waveforms."""

from tee_optical_flow_tpu.io.waveforms import (  # noqa: F401
    WaveformResult,
    load_all_waveforms,
    waveform_paths,
)

__all__ = ["load_all_waveforms", "waveform_paths", "WaveformResult"]
