"""Savitzky-Golay filtering as a convolution (device-friendly).

Replaces scipy.signal.savgol_filter used on centroid tracks
(analysis.py:75-81). Coefficients are computed host-side (static shapes),
application is a correlation along the leading axis, matching scipy's
default 'interp' edge mode via polynomial extrapolation at the ends.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def savgol_coeffs(window: int, poly: int) -> np.ndarray:
    """Least-squares smoothing coefficients for the window center
    (supports even windows the way scipy does: center at window//2 ... scipy
    uses pos = (window-1)/2 for odd; for even windows scipy requires pos
    given; the reference passes window=10 (even), where scipy defaults to
    pos = 4.5; we match that)."""
    if poly >= window:
        raise ValueError("polyorder must be less than window_length")
    pos = (window - 1) / 2.0
    x = np.arange(window, dtype=np.float64) - pos
    a = np.vander(x, poly + 1, increasing=True)  # (window, poly+1)
    # coefficients = first row of pinv: evaluate fitted poly at 0
    pinv = np.linalg.pinv(a)
    return pinv[0]


def savgol_filter_np(arr: np.ndarray, window: int, poly: int) -> np.ndarray:
    """scipy-compatible savgol along axis 0 with 'interp' edges."""
    arr = np.asarray(arr, dtype=np.float64)
    squeeze = arr.ndim == 1
    data = arr[:, None] if squeeze else arr
    n = data.shape[0]
    if n < window:
        raise ValueError("input shorter than window")
    coeffs = savgol_coeffs(window, poly)
    halflo = int(np.floor((window - 1) / 2.0))
    halfhi = window - 1 - halflo

    out = np.empty_like(data)
    # interior via correlation
    for j in range(data.shape[1]):
        conv = np.convolve(data[:, j], coeffs[::-1], mode="valid")
        out[halflo:n - halfhi, j] = conv
        # edge handling: fit a poly to the first/last window and evaluate
        x_head = np.arange(window)
        p_head = np.polyfit(x_head, data[:window, j], poly)
        out[:halflo, j] = np.polyval(p_head, x_head[:halflo])
        p_tail = np.polyfit(x_head, data[n - window:, j], poly)
        out[n - halfhi:, j] = np.polyval(p_tail, x_head[window - halfhi:])
    return out[:, 0] if squeeze else out


def savgol_filter_jnp(arr, window: int, poly: int):
    """Device variant: interior correlation + precomputed edge projectors,
    fully jit-able (all shapes static)."""
    arr = jnp.asarray(arr, dtype=jnp.float32)
    squeeze = arr.ndim == 1
    data = arr[:, None] if squeeze else arr
    n = data.shape[0]
    if n < window:
        raise ValueError("input shorter than window")
    coeffs = jnp.asarray(savgol_coeffs(window, poly), dtype=jnp.float32)
    halflo = int(np.floor((window - 1) / 2.0))
    halfhi = window - 1 - halflo

    # interior: (n - window + 1) valid positions
    def corr_one(col):
        return jnp.convolve(col, coeffs[::-1], mode="valid")

    interior = jnp.stack([corr_one(data[:, j]) for j in range(data.shape[1])], axis=1)

    # edge projectors: evaluate the LS poly fit of the first/last window
    x = np.arange(window, dtype=np.float64)
    v = np.vander(x, poly + 1, increasing=True)
    proj = v @ np.linalg.pinv(v)  # (window, window) maps samples -> fitted values
    head_p = jnp.asarray(proj[:halflo], dtype=jnp.float32)
    tail_p = jnp.asarray(proj[window - halfhi:], dtype=jnp.float32)

    head = head_p @ data[:window]
    tail = tail_p @ data[n - window:]
    out = jnp.concatenate([head, interior, tail], axis=0)
    return out[:, 0] if squeeze else out
