"""Cohort-scale clinical analysis: HDF5 -> 69-value row -> CSV.

Parity with the reference's legacy cohort loop
(analyze_optical_flow.py:1361-1516): per file and (param, label), run the
ECG-gated and arterial-gated pipelines for both the total-magnitude trace
and the radial/longitudinal decomposition, assemble the 15 metadata
values + 9 + 9 + 18 + 18 statistics into one 69-value row (the schema of
file_io.py:207-247), zero-filling any gate that fails (reference
:1417-1470 wraps each in try/except).
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional

import numpy as np

from ..analysis import calculate_3dhist, calculate_3dhist_radlong
from ..config import (
    AnalysisConfig, ProcessingConfig, VisualizationConfig,
    arterial_gated_config, ecg_gated_config,
)
from ..dataset import OpticalFlowDataset
from ..io.tabular import aggregate_pkl_files
from ..signal.cycles import ArterialDetector, ECGLazyDetector
from ..signal.smoother import spectral_smooth
from ..utils import safe_makedir
from ..viz.manager import VisualizationManager

logger = logging.getLogger(__name__)

_ZERO9 = tuple([0.0] * 8 + [0])
_ZERO18 = tuple([0.0] * 16 + [0, 0])


def _detect(ds, gate: str, cc_config, proc_config):
    if gate == "ecg":
        det = ECGLazyDetector(cc_config, None, proc_config)
        return det.detect(ds, ds.ecg, int(ds.ecg_sampling_rate))
    det = ArterialDetector(cc_config, None, proc_config)
    return det.detect(ds, ds.art, int(ds.art_sampling_rate))


def _total_trace(ds, masked, manager, analysis_config):
    """Gate-independent half of the total-magnitude analysis: the smoothed
    high-percentile trace. The gates differ only in which frames count as
    systole/diastole, which enters at peak detection — the reference's
    cohort loop recomputes this identically per gate
    (analyze_optical_flow.py:1410-1454); computing it once is
    bit-identical and halves the device passes per file."""
    _mag, _ang, _me, _ae, perc_hi = calculate_3dhist(
        masked, ds.nframes, nbins=analysis_config.nbins,
        percentile=analysis_config.percentile)
    return spectral_smooth(perc_hi, manager.peak_config.smooth_fraction,
                           manager.peak_config.pad_len)


def _radlong_traces(ds, masked, av_masks, analysis_config):
    """Gate-independent half of the radial/longitudinal analysis:
    (rad_hi, rad_lo, long_hi, long_lo)."""
    data = calculate_3dhist_radlong(
        masked, av_masks, ds.nframes, nbins=analysis_config.nbins,
        perc_lo=analysis_config.perc_lo, perc_hi=analysis_config.perc_hi,
        av_filter_flag=analysis_config.av_filter_flag,
        av_savgol_window=analysis_config.av_savgol_window,
        av_savgol_poly=analysis_config.av_savgol_poly)
    _f, _e, rad_hi, rad_lo = data["radial"]
    _f, _e, long_hi, long_lo = data["longitudinal"]
    return rad_hi, rad_lo, long_hi, long_lo


def _total_stats(ds, param, label, gate, sys_frames, dia_frames, manager,
                 save_dir, filt, frame_times):
    save_path = os.path.join(save_dir, "plots",
                             f"{ds.filename}_{gate}_{param}_{label}_total.png")
    return manager.plot_peak_line(
        filt, frame_times, sys_frames, dia_frames, ds.nframes, param,
        ds._param_unit(param), label, save_path, cc_method=gate,
        print_report=False, return_statistics=True)


def _radlong_stats(ds, param, label, gate, sys_frames, dia_frames, manager,
                   save_dir, traces, frame_times):
    rad_hi, rad_lo, long_hi, long_lo = traces
    save_path = os.path.join(save_dir, "plots",
                             f"{ds.filename}_{gate}_{param}_{label}_radlong.png")
    return manager.plot_peak_line_radlong(
        rad_hi, rad_lo, long_hi, long_lo, frame_times, sys_frames, dia_frames,
        ds.nframes, param, ds._param_unit(param), label, save_path,
        cc_method=gate, print_report=False, return_statistics=True)


def _waveform_stats(ds):
    def mmm(arr):
        arr = np.asarray(arr, np.float64)
        return float(arr.mean()), float(arr.max()), float(arr.min())

    art = mmm(ds.art) if hasattr(ds, "art") else (0.0, 0.0, 0.0)
    cvp = mmm(ds.cvp) if getattr(ds, "cvp_exists", False) else (0.0, 0.0, 0.0)
    pap = mmm(ds.pap) if getattr(ds, "pap_exists", False) else (0.0, 0.0, 0.0)
    return art, cvp, pap


def analyze_cohort_file(filepath: str, param: str = "velocity",
                        label: str = "rv", save_dir: str = ".",
                        analysis_config: Optional[AnalysisConfig] = None,
                        proc_config: Optional[ProcessingConfig] = None) -> List:
    """One HDF5 -> one 69-value row (reference :1397-1499)."""
    analysis_config = analysis_config or AnalysisConfig()
    proc_config = proc_config or ProcessingConfig()
    vis = VisualizationConfig(show_img=False)
    manager = VisualizationManager(vis_config=vis, proc_config=proc_config)
    safe_makedir(os.path.join(save_dir, "plots"))

    with OpticalFlowDataset(filepath) as ds:
        rows = {}
        # upload the masked parameter once and reuse it across both gates
        # and both analyses (the same (N, H, W, 2) array otherwise rides
        # the device link four times per file — seconds on tunnel-class
        # links)
        import jax.numpy as jnp

        masked_dev = jnp.asarray(ds.get_masked_arr(param, label))
        av_masks = (ds.get_mask("av") if "av" in ds.accepted_labels
                    else None)
        frame_times = np.arange(ds.nframes) / ds.frame_rate

        # gate-independent data passes, computed ONCE (see _total_trace);
        # a failure here zero-fills that analysis for both gates — the
        # reference's per-gate recomputation would have failed identically
        filt = traces = None
        try:
            filt = _total_trace(ds, masked_dev, manager, analysis_config)
        except Exception as exc:
            logger.warning("%s total trace failed: %s", filepath, exc)
        if "av" in ds.accepted_labels:
            try:
                traces = _radlong_traces(ds, masked_dev, av_masks,
                                         analysis_config)
            except Exception as exc:
                logger.warning("%s radlong traces failed: %s", filepath, exc)

        for gate, cc_cfg in (("ecg_lazy", ecg_gated_config()),
                             ("arterial", arterial_gated_config())):
            gate_key = "ecg" if gate == "ecg_lazy" else "art"
            # one detection per gate (deterministic: the reference's
            # second detect call per gate returns identical frames)
            sys_f = dia_f = None
            try:
                proc_gate = ProcessingConfig(recalculate=True,
                                             verbose=proc_config.verbose)
                sys_f, dia_f = _detect(ds, "ecg" if gate == "ecg_lazy" else "art",
                                       cc_cfg, proc_gate)
            except Exception as exc:
                logger.warning("%s %s detect failed: %s", filepath, gate_key, exc)
            try:
                if sys_f is None or filt is None:
                    raise RuntimeError("gate detection or total trace failed")
                rows[f"{gate_key}_total"] = _total_stats(
                    ds, param, label, gate, sys_f, dia_f, manager,
                    save_dir, filt, frame_times)
            except Exception as exc:
                logger.warning("%s %s total failed: %s", filepath, gate_key, exc)
                rows[f"{gate_key}_total"] = _ZERO9
            try:
                if "av" in ds.accepted_labels:
                    if sys_f is None or traces is None:
                        raise RuntimeError(
                            "gate detection or radlong traces failed")
                    rows[f"{gate_key}_radlong"] = _radlong_stats(
                        ds, param, label, gate, sys_f, dia_f, manager,
                        save_dir, traces, frame_times)
                else:
                    rows[f"{gate_key}_radlong"] = _ZERO18
            except Exception as exc:
                logger.warning("%s %s radlong failed: %s", filepath, gate_key, exc)
                rows[f"{gate_key}_radlong"] = _ZERO18

        art, cvp, pap = _waveform_stats(ds)
        meta = [
            ds.filename, str(getattr(ds, "ID", "")), float(ds.frame_rate),
            float(ds.pixel_spacing), 0, int(ds.nframes),
            art[0], art[1], art[2], cvp[0], cvp[1], cvp[2],
            pap[0], pap[1], pap[2],
        ]

    # 15 + 9 + 9 + 18 + 18 = 69 (column order of file_io.py:207-247)
    return (meta + list(rows["ecg_total"]) + list(rows["art_total"]) +
            list(rows["ecg_radlong"]) + list(rows["art_radlong"]))


def run_cohort_analysis(folder: str, save_dir: str,
                        param_list: Optional[List[str]] = None,
                        label_list: Optional[List[str]] = None,
                        nchunks: int = 1, chunk_index: int = 0,
                        recalculate: bool = False,
                        aggregate: bool = True, verbose: bool = True):
    """Full cohort run: shard, analyze, merge to CSV (reference
    :1361-1620 + file_io.py:168-251)."""
    from .processor import analyze_hdf5_folder

    param_list = param_list or ["velocity"]
    label_list = label_list or ["rv"]
    errors = analyze_hdf5_folder(
        folder, save_dir, param_list, label_list, analyze_cohort_file,
        nchunks=nchunks, chunk_index=chunk_index, recalculate=recalculate,
        verbose=verbose)
    if aggregate:
        aggregate_pkl_files(param_list, label_list, save_dir)
    return errors
