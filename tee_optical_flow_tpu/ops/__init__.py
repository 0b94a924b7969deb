from .imaging import rgb2gray, img2uint8_jnp, normalize_imagenet, resize_frames
from .morphology import (
    connected_components,
    remove_small_objects,
    binary_fill_holes,
    moving_avg_mask,
    clean_binary_stack,
    component_areas_and_centroids,
    label_first_area,
    largest_centroid_series,
)
from .otsu import threshold_otsu
from .histogram import masked_histogram, masked_percentile, carry_forward
from .smoothing import savgol_filter_jnp, savgol_coeffs

__all__ = [
    "rgb2gray", "img2uint8_jnp", "normalize_imagenet", "resize_frames",
    "connected_components", "remove_small_objects", "binary_fill_holes",
    "moving_avg_mask", "clean_binary_stack", "component_areas_and_centroids",
    "label_first_area", "largest_centroid_series",
    "threshold_otsu", "masked_histogram", "masked_percentile", "carry_forward",
    "savgol_filter_jnp", "savgol_coeffs",
]
