"""Drop-in import alias for the reference ``optical_flow`` package.

Reference user code imports ``optical_flow.*`` (reference
optical_flow/api.py:20, example_peak_plots.py:24-40); this package lets
those import lines run unchanged against the TPU-native framework: every
module here re-exports the matching surface from
:mod:`tee_optical_flow_tpu` (see MIGRATION.md for the full mapping).
No logic lives here — behaviour, configs and artifact contracts are the
ones documented in the real package.
"""

from . import (  # noqa: F401
    analysis,
    api,
    batch_processing,
    cache,
    cardiac_cycle_detection,
    config,
    exceptions,
    file_io,
    optical_flow_dataset,
    optical_flow_utils,
    peak_detection,
    plotting_utils,
    waveform_loader,
)

__all__ = [
    "analysis", "api", "batch_processing", "cache",
    "cardiac_cycle_detection", "config", "exceptions", "file_io",
    "optical_flow_dataset", "optical_flow_utils", "peak_detection",
    "plotting_utils", "waveform_loader",
]
# calculate_optical_flow / visualization / analyze_optical_flow pull in
# jax / matplotlib stacks — imported lazily (as submodules) rather than
# eagerly here, matching how reference user code reaches them.
