"""Per-frame flow histograms + percentile traces.

Parity with reference analysis.py:166-327 — including its load-bearing
quirks, which downstream plotting depends on:
  * histogram counts get ``+1`` so LogNorm never sees zero (:207);
  * ``calculate_3dhist_radlong`` returns ``edges[:-1]`` (nbins values, not
    nbins+1; the viz layer reconstructs the final edge, :325-326);
  * empty frames carry the previous frame's values forward.

The per-frame work (cartToPolar, nonzero histograms over a clip-global
range, nonzero percentiles) runs as batched device kernels; carry-forward
fix-ups are host-side.
"""

from __future__ import annotations

import logging
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.histogram import (
    carry_forward, framewise_hist_pack, framewise_hist_pack_group,
    histogram_edges,
)
from .centroid import calc_AV_centroid
from .components import calculate_comp_magnitude

logger = logging.getLogger(__name__)


@jax.jit
def cart_to_polar(flow: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cv2.cartToPolar semantics: magnitude and angle in [0, 2*pi).
    flow: (..., 2) -> (mag, ang) each (...)."""
    x = flow[..., 0].astype(jnp.float32)
    y = flow[..., 1].astype(jnp.float32)
    mag = jnp.sqrt(x * x + y * y)
    ang = jnp.arctan2(y, x)
    ang = jnp.where(ang < 0, ang + 2 * jnp.pi, ang)
    return mag, ang


def _framewise_hist_and_percentiles(arr, nframes: int, percs, nbins: int):
    """Shared device pass: global range, per-frame nonzero histogram (+1)
    and nonzero percentiles with reference carry-forward policy.

    ``arr`` may be a device array — it stays resident (no host round
    trip), and the whole pass is one fused program with a single
    readback (ops/histogram.framewise_hist_pack)."""
    dev = jnp.asarray(arr)[:nframes]
    pack = np.asarray(framewise_hist_pack(
        dev, jnp.asarray(np.asarray(percs, np.float32)), nbins=nbins))
    return _unpack_one(pack, nbins, len(percs))


def _unpack_one(pack, nbins: int, nperc: int):
    """Host-side unpack of one framewise_hist_pack result (the shared
    tail of _framewise_hist_and_percentiles)."""
    freq = pack[:-1, :nbins]
    vals = pack[:-1, nbins:nbins + nperc]
    valid = pack[:-1, -1] > 0
    gmin = float(pack[-1, 0])
    gmax = float(pack[-1, 1])
    for i in np.where(~valid)[0]:
        logger.warning("len(flat_nonzero) is 0 for frame %d", i)
    freq = carry_forward(freq + 1.0, valid, np.ones(nbins))
    edges = histogram_edges(gmin, gmax, nbins)
    return freq, edges, vals, valid, gmin, gmax


def _framewise_group(arrs, nframes: int, percs_list, nbins: int):
    """G same-shape device arrays through ONE fused pack program with one
    readback (ops/histogram.framewise_hist_pack_group); per-element
    results identical to G separate _framewise_hist_and_percentiles
    calls. ``percs_list`` is a (G, P) list of per-element percentiles."""
    dev = jnp.stack([jnp.asarray(a)[:nframes] for a in arrs])
    p = np.asarray(percs_list, np.float32)
    packs = np.asarray(framewise_hist_pack_group(
        dev, jnp.asarray(p), nbins=nbins))
    return [_unpack_one(packs[g], nbins, p.shape[1])
            for g in range(len(arrs))]


def calc_bidirectional_hist(mag_arr, nframes: int, perc_lo: int = 1,
                            perc_hi: int = 99, nbins: int = 1000):
    """(freq (N, nbins), edges (nbins+1,), hi (N,), lo (N,)) —
    reference analysis.py:166-212."""
    freq, edges, vals, valid, gmin, gmax = _framewise_hist_and_percentiles(
        mag_arr, nframes, [perc_lo, perc_hi], nbins)
    lo = carry_forward(vals[:, 0], valid, gmin)
    hi = carry_forward(vals[:, 1], valid, gmax)
    return freq, edges, hi, lo


def calculate_3dhist(masked_arr, nframes: int, nbins: int = 1000,
                     percentile: int = 99):
    """(mag_freq, ang_freq, mag_edges, ang_edges, perc_hi) —
    reference analysis.py:215-286."""
    dev = jnp.asarray(masked_arr)[:nframes]
    mag, ang = cart_to_polar(dev)

    # mag/ang stay device-resident into ONE grouped hist pass (a single
    # dispatch + readback instead of two; latency-bound on tunnel links)
    (mag_freq, mag_edges, mvals, mvalid, _mmin, mmax), \
        (ang_freq, ang_edges, _avals, _avalid, _amin, _amax) = \
        _framewise_group((mag, ang), nframes, [[percentile], [50]], nbins)
    perc_hi = carry_forward(mvals[:, 0], mvalid, mmax)

    return mag_freq, ang_freq, mag_edges, ang_edges, perc_hi


def calculate_3dhist_radlong(param_arr, av_masks, nframes: int,
                             nbins: int = 1000, perc_lo: int = 1,
                             perc_hi: int = 99, av_filter_flag: bool = True,
                             av_savgol_window: int = 10, av_savgol_poly: int = 4,
                             verbose: bool = False) -> dict:
    """Radial + longitudinal bidirectional histograms about the AV centroid
    (reference analysis.py:289-327). Returns dict with 'radial' and
    'longitudinal' -> (freq, edges[:-1], hi, lo)."""
    centroids = calc_AV_centroid(av_masks, nframes, filter=av_filter_flag,
                                 savgol_window=av_savgol_window,
                                 savgol_poly=av_savgol_poly, verbose=verbose)
    rad_arr, long_arr = calculate_comp_magnitude(param_arr, centroids)

    # radial + longitudinal through one grouped device pass (identical
    # results to two calc_bidirectional_hist calls, one readback)
    percs = [[perc_lo, perc_hi]] * 2
    (rfreq, redges, rvals, rvalid, rmin, rmax), \
        (lfreq, ledges, lvals, lvalid, lmin, lmax) = \
        _framewise_group((rad_arr, long_arr), nframes, percs, nbins)
    rad = (rfreq, redges, carry_forward(rvals[:, 1], rvalid, rmax),
           carry_forward(rvals[:, 0], rvalid, rmin))
    lng = (lfreq, ledges, carry_forward(lvals[:, 1], lvalid, lmax),
           carry_forward(lvals[:, 0], lvalid, lmin))
    # the reference drops the last edge here (analysis.py:325-326); the viz
    # layer reconstructs it — preserved for artifact compatibility
    return {
        "radial": (rad[0], rad[1][:-1], rad[2], rad[3]),
        "longitudinal": (lng[0], lng[1][:-1], lng[2], lng[3]),
    }
