"""Clip segmentation -> cleaned per-label masks.

Parity with reference calculate_optical_flow.py:90-241, with the per-frame
Python loops replaced by batched device kernels:

  * ``clean_mask``: one-hot per label map (A4C 8 classes / RVIO_2class /
    MouseRV_A4C), temporal moving-average (window 4, thresh 0.49), then
    fill-holes + remove-small-objects per frame, background = NOT(union),
    every mask broadcast to (N, H, W, 2) so it multiplies flow directly;
  * ``predict_movie_thres``: per-frame Otsu -> fill/remove -> temporal
    moving average (note the *reversed* order vs clean_mask — the
    reference does it this way in each path and the outputs differ);
  * ``predict_movie``: runs a segmentor callable over the clip (the Flax
    SAM inference graph in models/) and cleans the result.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..config import OpticalFlowCalculationConfig, default_optical_flow_config
from ..ops.imaging import rgb2gray
from ..ops.morphology import (
    clean_binary_stack, moving_avg_mask, pack_mask_bits, unpack_mask_bits,
)
from ..ops.otsu import otsu_mask_stack

logger = logging.getLogger(__name__)

# label-value maps per mode (reference calculate_optical_flow.py:132-152)
LABEL_MAPS = {
    "A4C": {
        "lv_inner": 1, "lv": 2, "la_inner": 3, "la": 4,
        "rv_inner": 5, "ra_inner": 6, "rv": 7, "ra": 8,
    },
    "RVIO_2class": {"rv": 1, "av": 2},
    "MouseRV_A4C": {"rv": 1, "rv_inner": 2},
}


def clean_mask(arr: np.ndarray, mode: str = "A4C", verbose: bool = False,
               config: Optional[OpticalFlowCalculationConfig] = None
               ) -> Optional[Dict[str, np.ndarray]]:
    """(N, H, W) integer label movie -> {label: (N, H, W, 2) bool} + 'bkgd'."""
    if config is None:
        config = default_optical_flow_config()
    label_map = LABEL_MAPS.get(mode)
    if label_map is None:
        logger.error("mode=%s not supported, must be %s!", mode,
                     list(LABEL_MAPS.keys()))
        return None

    # dispatch EVERY label's cleanup before downloading ANY result: jax
    # dispatch is async, so the device runs label i+1's moving-average +
    # fill/remove while label i's mask streams back over the (slow) link,
    # and bkgd = NOT(union) stays on device. Measured at (40, 480, 640),
    # 2 labels, on chip: blocking per-label 4.25 s, this 2.62 s. (Fusing
    # all labels into one label-vmapped program was tried and measured
    # 9.5 s — the big vmapped program compiles to slower code than the
    # per-label ones, dwarfing the round-trip savings.) Masks download
    # bit-packed: 8x fewer bytes on a ~30 MB/s link. ``arr`` may already
    # be a device array (the SAM label path never leaves the chip).
    arr_dev = arr if isinstance(arr, jnp.ndarray) else \
        jnp.asarray(np.asarray(arr))
    cleans = []
    for value in label_map.values():
        avg = moving_avg_mask(arr_dev == value, n=config.moving_avg_window,
                              threshold=config.moving_avg_threshold)
        cleans.append(clean_binary_stack(avg, min_size=config.min_mask_size))
    union = cleans[0]
    for clean in cleans[1:]:
        union = union | clean
    shape = cleans[0].shape
    packs = [pack_mask_bits(c) for c in cleans] + [pack_mask_bits(~union)]

    mask_dict: Dict[str, np.ndarray] = {}
    for name, pack in zip(list(label_map) + ["bkgd"], packs):
        mask = unpack_mask_bits(pack, shape)
        mask_dict[name] = np.repeat(mask[:, :, :, None], 2, axis=3)
        if verbose and name != "bkgd":
            logger.debug("For mask %s, produced cleaned mask arr of shape %s",
                         name, mask_dict[name].shape)
    return mask_dict


def predict_movie_thres(nparr: np.ndarray, verbose: bool = False,
                        config: Optional[OpticalFlowCalculationConfig] = None,
                        _gray_dev: Optional[jnp.ndarray] = None
                        ) -> Dict[str, np.ndarray]:
    """Otsu-threshold masks for the no-SAM path
    (reference calculate_optical_flow.py:184-213).

    ``_gray_dev`` lets the pipeline pass its already-device-resident
    grayscale clip so this path adds no second clip upload."""
    if config is None:
        config = default_optical_flow_config()
    gray = (_gray_dev if _gray_dev is not None
            else rgb2gray(jnp.asarray(np.asarray(nparr))))
    raw = otsu_mask_stack(gray)
    clean = clean_binary_stack(raw, min_size=config.min_mask_size)
    avg_dev = moving_avg_mask(clean, n=config.moving_avg_window,
                              threshold=config.moving_avg_threshold)
    avg = unpack_mask_bits(pack_mask_bits(avg_dev), avg_dev.shape)
    return {"otsu": np.repeat(avg[:, :, :, None], 2, axis=3)}


def predict_movie(nparr: np.ndarray, segmentor: Callable[[np.ndarray], np.ndarray],
                  mode: str = "A4C", verbose: bool = False,
                  config: Optional[OpticalFlowCalculationConfig] = None,
                  _clip_dev: Optional[jnp.ndarray] = None
                  ) -> Optional[Dict[str, np.ndarray]]:
    """Run a clip segmentor ((N, H, W, 3) uint8 -> (N, H, W) labels) and
    clean (reference calculate_optical_flow.py:215-241). The segmentor is
    the batched Flax SAM inference graph — no per-frame host round-trips.

    When the segmentor exposes ``labels_device`` (make_clip_segmentor
    does) and the pipeline hands over its device-resident clip via
    ``_clip_dev``, the label movie never touches the host: segmentation,
    NEAREST upsample and mask cleanup all stay on chip."""
    device_fn = getattr(segmentor, "labels_device", None)
    if device_fn is not None and _clip_dev is not None:
        h, w = np.asarray(nparr).shape[1:3]
        labels = device_fn(_clip_dev, (h, w))
    else:
        labels = np.asarray(segmentor(np.asarray(nparr)))
    return clean_mask(labels, mode, verbose, config=config)
