"""Shared plotting helpers (reference optical_flow/plotting_utils.py:13-162).

All matplotlib, all host-side; imported lazily by the manager so headless
pipeline runs never pay the import.
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg", force=False)
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def add_systole_diastole_shading(ax, frame_times, sys_frames, dia_frames,
                                 nframes: int, sys_color: str = "0.8",
                                 dia_color: str = "0.95") -> None:
    """Shade systole (dark) / diastole (light) frame intervals on a
    time axis (reference plotting_utils.py:13-57)."""
    frame_times = np.asarray(frame_times)
    first = True
    for start, stop in (sys_frames or []):
        start = int(np.clip(start, 0, nframes - 1))
        stop = int(np.clip(stop, 0, nframes - 1))
        ax.axvspan(frame_times[start], frame_times[stop], facecolor=sys_color,
                   alpha=0.5, label="systole" if first else None)
        first = False
    first = True
    for start, stop in (dia_frames or []):
        start = int(np.clip(start, 0, nframes - 1))
        stop = int(np.clip(stop, 0, nframes - 1))
        ax.axvspan(frame_times[start], frame_times[stop], facecolor=dia_color,
                   alpha=0.4, label="diastole" if first else None)
        first = False


def plot_waveform_with_shading(ax, waveform_data, waveform_times, frame_times,
                               sys_frames, dia_frames, nframes: int,
                               ylabel: str = "") -> None:
    """Waveform subplot under a heatmap with cycle shading
    (reference plotting_utils.py:60-82)."""
    waveform_data = np.asarray(waveform_data)
    if waveform_times is None:
        waveform_times = np.linspace(frame_times[0], frame_times[-1],
                                     waveform_data.size)
    ax.plot(np.asarray(waveform_times), waveform_data, lw=0.8)
    add_systole_diastole_shading(ax, frame_times, sys_frames, dia_frames, nframes)
    ax.set_xlabel("Time (ms)")
    if ylabel:
        ax.set_ylabel(ylabel)
    ax.set_xlim(frame_times[0], frame_times[-1])


def create_heatmap_figure(show_waveform: bool = False,
                          show_sysdia: bool = False):
    """Two heatmap panels + optional timeline strip, gridspec height
    ratios [4,4,1] / [4,4,0.5] (reference plotting_utils.py:85-116)."""
    if show_waveform:
        fig = plt.figure(figsize=(10, 9))
        gs = fig.add_gridspec(3, 1, height_ratios=[4, 4, 1])
        axes = [fig.add_subplot(gs[i]) for i in range(3)]
    elif show_sysdia:
        fig = plt.figure(figsize=(10, 8.5))
        gs = fig.add_gridspec(3, 1, height_ratios=[4, 4, 0.5])
        axes = [fig.add_subplot(gs[i]) for i in range(3)]
    else:
        fig = plt.figure(figsize=(10, 8))
        gs = fig.add_gridspec(2, 1)
        axes = [fig.add_subplot(gs[i]) for i in range(2)]
    return fig, axes


def setup_colorbar(mappable, ax, label: str = "") -> None:
    """(reference plotting_utils.py:119-128)."""
    cbar = plt.colorbar(mappable, ax=ax)
    if label:
        cbar.set_label(label)


def get_colormap(name: str):
    """Named colormap with graceful viridis fallback
    (reference plotting_utils.py:131-141)."""
    try:
        return plt.get_cmap(name)
    except ValueError:
        return plt.get_cmap("viridis")


def annotate_peaks(ax, px, py, color: str = "r", marker: str = "+",
                   size: int = 8, fontsize: int = 8,
                   offset=(1.5, 1.5), fmt: str = "{:.1f}",
                   show_annotations: bool = True) -> None:
    """Scatter + value labels on detected peaks
    (reference plotting_utils.py:144-162)."""
    px = np.asarray(px)
    py = np.asarray(py)
    ax.plot(px, py, marker, color=color, markersize=size)
    if show_annotations:
        for x, y in zip(px, py):
            ax.annotate(fmt.format(float(y)), (x, y),
                        xytext=(x + offset[0], y + offset[1]),
                        fontsize=fontsize, color=color)
