"""Spectral (Fourier low-pass) smoothing.

Replaces tsmoothie's ``SpectralSmoother`` used throughout the reference
(e.g. peak_detection.py:165-170, cardiac_cycle_detection.py:117-122): the
series is symmetric-padded by ``pad_len`` samples per side, transformed
with a real FFT, all bins with normalized frequency above
``smooth_fraction / 2`` are zeroed (i.e. the lowest ``smooth_fraction``
of the spectrum is kept), and the inverse transform is cropped back.

Both a NumPy path (host waveforms: tiny 1-D arrays where device dispatch
would dominate) and a jnp path (batched frame-series already resident on
device) are provided; they are numerically identical.
"""

from __future__ import annotations

import numpy as np


def _pad_amount(n: int, pad_len: int) -> int:
    # symmetric padding cannot exceed the series length
    return int(max(0, min(pad_len, n - 1)))


def spectral_smooth(arr, smooth_fraction: float = 0.3, pad_len: int = 20):
    """Low-pass an array along its last axis. NumPy in, NumPy out."""
    arr = np.asarray(arr, dtype=np.float64)
    squeeze = arr.ndim == 1
    data = arr[None, :] if squeeze else arr
    n = data.shape[-1]
    if n < 3:
        return arr.copy()
    p = _pad_amount(n, pad_len)
    padded = np.pad(data, [(0, 0)] * (data.ndim - 1) + [(p, p)], mode="symmetric")
    spectrum = np.fft.rfft(padded, axis=-1)
    freqs = np.fft.rfftfreq(padded.shape[-1])
    spectrum[..., freqs > smooth_fraction / 2.0] = 0.0
    smoothed = np.fft.irfft(spectrum, n=padded.shape[-1], axis=-1)
    out = smoothed[..., p:p + n]
    return out[0] if squeeze else out


def spectral_smooth_jnp(arr, smooth_fraction: float = 0.3, pad_len: int = 20):
    """jit-compatible variant for device-resident batched series.

    ``arr`` may be (..., N); smoothing is along the last axis. All shapes
    are static so this traces cleanly under jit/vmap.
    """
    import jax.numpy as jnp

    arr = jnp.asarray(arr, dtype=jnp.float32)
    n = arr.shape[-1]
    if n < 3:
        return arr
    p = _pad_amount(n, pad_len)
    pad_width = [(0, 0)] * (arr.ndim - 1) + [(p, p)]
    padded = jnp.pad(arr, pad_width, mode="symmetric")
    spectrum = jnp.fft.rfft(padded, axis=-1)
    freqs = np.fft.rfftfreq(padded.shape[-1])  # static: host-computed mask
    keep = jnp.asarray(freqs <= smooth_fraction / 2.0)
    spectrum = spectrum * keep
    smoothed = jnp.fft.irfft(spectrum, n=padded.shape[-1], axis=-1)
    return smoothed[..., p:p + n]
