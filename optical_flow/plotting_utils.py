"""Alias of reference optical_flow/plotting_utils.py (shared plot
helpers; reference plotting_utils.py:13-162) ->
tee_optical_flow_tpu.viz.plotting_utils."""

from tee_optical_flow_tpu.viz.plotting_utils import (  # noqa: F401
    add_systole_diastole_shading,
    annotate_peaks,
    create_heatmap_figure,
    get_colormap,
    plot_waveform_with_shading,
    setup_colorbar,
)

__all__ = ["add_systole_diastole_shading", "plot_waveform_with_shading",
           "create_heatmap_figure", "setup_colorbar", "get_colormap",
           "annotate_peaks"]
