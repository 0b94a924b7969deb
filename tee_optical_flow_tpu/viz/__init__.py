from .plotting_utils import (
    add_systole_diastole_shading, annotate_peaks, create_heatmap_figure,
    get_colormap, plot_waveform_with_shading, setup_colorbar,
)
from .manager import VisualizationManager

__all__ = [
    "VisualizationManager", "add_systole_diastole_shading", "annotate_peaks",
    "create_heatmap_figure", "get_colormap", "plot_waveform_with_shading",
    "setup_colorbar",
]
