"""Alias of reference optical_flow/analysis.py (centroid / component /
histogram math; reference analysis.py:18-327) ->
tee_optical_flow_tpu.analysis."""

from tee_optical_flow_tpu.analysis import (  # noqa: F401
    calc_AV_centroid,
    calc_bidirectional_hist,
    calc_proj_mag,
    calculate_3dhist,
    calculate_3dhist_radlong,
    calculate_comp_magnitude,
    find_correct_centroid,
    radial_vecgrid,
)

__all__ = ["find_correct_centroid", "calc_AV_centroid", "radial_vecgrid",
           "calc_proj_mag", "calculate_comp_magnitude",
           "calc_bidirectional_hist", "calculate_3dhist",
           "calculate_3dhist_radlong"]
