"""Per-frame masked histograms and percentiles, batched on device.

The reference computes, frame by frame in Python, a histogram and
percentiles of the *nonzero* pixels with a clip-global bin range
(analysis.py:166-212, :215-286). Here the whole clip is one vmapped
kernel: a scatter-add histogram and a sort-based masked percentile per
frame. Empty frames are flagged and the reference's carry-forward policy
is applied by ``carry_forward`` on the host (tiny data, ragged policy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("nbins",))
def masked_histogram(frames: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                     nbins: int = 1000) -> jnp.ndarray:
    """Histogram of nonzero pixels per frame over the global [lo, hi] range,
    np.histogram edge semantics (right-inclusive last bin).

    frames: (N, ...) -> returns (N, nbins) float32 counts.
    """
    n = frames.shape[0]
    flat = frames.reshape(n, -1).astype(jnp.float32)
    span = jnp.maximum(hi - lo, 1e-12)
    scaled = (flat - lo) / span * nbins
    bucket = jnp.clip(jnp.floor(scaled).astype(jnp.int32), 0, nbins - 1)
    # np.histogram places x == hi in the last bin; floor already handles
    # interior edges identically.
    weights = (flat != 0).astype(jnp.float32)
    # also exclude out-of-range values like np.histogram does
    in_range = (flat >= lo) & (flat <= hi)
    weights = weights * in_range.astype(jnp.float32)

    def one(bucket_row, w_row):
        return jnp.zeros(nbins, jnp.float32).at[bucket_row].add(w_row)

    return jax.vmap(one)(bucket, weights)


@jax.jit
def masked_percentile(frames: jnp.ndarray, percentiles: jnp.ndarray):
    """Per-frame percentiles of nonzero pixels (linear interpolation,
    np.percentile default).

    frames: (N, ...); percentiles: (P,) in [0, 100].
    Returns (values (N, P), valid (N,)) where valid marks frames with at
    least one nonzero pixel.
    """
    n = frames.shape[0]
    flat = frames.reshape(n, -1).astype(jnp.float32)
    m = flat.shape[1]
    nonzero = flat != 0
    counts = jnp.sum(nonzero, axis=1)
    # push zeros (masked-out) to +inf so ascending sort packs the k nonzero
    # values into the first k slots
    sortable = jnp.where(nonzero, flat, jnp.inf)
    srt = jnp.sort(sortable, axis=1)

    q = percentiles.astype(jnp.float32) / 100.0
    km1 = jnp.maximum(counts - 1, 0).astype(jnp.float32)
    pos = q[None, :] * km1[:, None]            # (N, P) fractional index
    lo_i = jnp.floor(pos).astype(jnp.int32)
    hi_i = jnp.minimum(lo_i + 1, jnp.maximum(counts - 1, 0)[:, None]).astype(jnp.int32)
    frac = pos - lo_i
    lo_v = jnp.take_along_axis(srt, jnp.clip(lo_i, 0, m - 1), axis=1)
    hi_v = jnp.take_along_axis(srt, jnp.clip(hi_i, 0, m - 1), axis=1)
    vals = lo_v * (1 - frac) + hi_v * frac
    return vals, counts > 0


@functools.partial(jax.jit, static_argnames=("nbins",))
def framewise_hist_pack(frames: jnp.ndarray, percentiles: jnp.ndarray,
                        nbins: int = 1000) -> jnp.ndarray:
    """One-readback pack of the whole per-frame analysis pass: nonzero
    histogram over the clip-global range, nonzero percentiles, validity,
    and the global min/max — one device program, one array out.

    The analysis host (batch/cohort.py) runs over a high-latency device
    link in some deployments (~0.3 s per round trip through the axon
    tunnel); issuing min/max/hist/percentile as separate readbacks made
    latency, not bandwidth, the cohort bottleneck.

    Returns (N+1, nbins + P + 1) float32: rows 0..N-1 are
    [hist | percentile values | valid], row N is [gmin, gmax, 0...].
    """
    frames = frames.astype(jnp.float32)
    gmin = jnp.min(frames)
    gmax = jnp.max(frames)
    freq = masked_histogram(frames, gmin, gmax, nbins=nbins)
    vals, valid = masked_percentile(frames, percentiles)
    rows = jnp.concatenate(
        [freq, vals, valid.astype(jnp.float32)[:, None]], axis=1)
    tail = jnp.zeros((1, rows.shape[1]), jnp.float32)
    tail = tail.at[0, 0].set(gmin).at[0, 1].set(gmax)
    return jnp.concatenate([rows, tail], axis=0)


@functools.partial(jax.jit, static_argnames=("nbins",))
def framewise_hist_pack_group(frames: jnp.ndarray, percentiles: jnp.ndarray,
                              nbins: int = 1000) -> jnp.ndarray:
    """``framewise_hist_pack`` vmapped over a leading group axis — G
    independent arrays analyzed in ONE device program with ONE readback
    (each group element keeps its own global range and percentiles).

    frames: (G, N, ...), percentiles: (G, P) -> (G, N+1, nbins + P + 1).
    Per-element results are identical to G separate pack calls; the
    grouping only removes G-1 device round trips (the cohort analysis
    issues its magnitude/angle and radial/longitudinal passes pairwise).
    """
    return jax.vmap(
        lambda f, p: framewise_hist_pack(f, p, nbins=nbins))(
            frames, percentiles)


def histogram_edges(lo: float, hi: float, nbins: int) -> np.ndarray:
    """np.histogram's bin edges for the global range (host helper)."""
    return np.linspace(lo, hi, nbins + 1)


def carry_forward(values: np.ndarray, valid: np.ndarray, default) -> np.ndarray:
    """Apply the reference's empty-frame policy on host: invalid frames
    take the previous valid frame's value; a leading invalid run takes
    ``default`` (analysis.py:192-202)."""
    values = np.array(values)
    valid = np.asarray(valid)
    out = values.copy()
    last = None
    for i in range(len(values)):
        if valid[i]:
            last = out[i]
        elif last is not None:
            out[i] = last
        else:
            out[i] = default
    return out
