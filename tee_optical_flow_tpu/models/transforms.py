"""ResizeLongestSide: image/coordinate/box resizing to the SAM input size.

Parity with reference finetune-SAM/models/sam/utils/transforms.py:16-101.
Host-side numpy + jax.image for the pixel resample.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


class ResizeLongestSide:
    def __init__(self, target_length: int):
        self.target_length = target_length

    @staticmethod
    def get_preprocess_shape(oldh: int, oldw: int, long_side: int) -> Tuple[int, int]:
        scale = long_side / max(oldh, oldw)
        newh, neww = oldh * scale, oldw * scale
        return int(newh + 0.5), int(neww + 0.5)

    def apply_image(self, image: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 -> resized so the longest side == target."""
        import jax
        import jax.numpy as jnp

        h, w = image.shape[:2]
        nh, nw = self.get_preprocess_shape(h, w, self.target_length)
        out = jax.image.resize(jnp.asarray(image, jnp.float32),
                               (nh, nw) + image.shape[2:], method="bilinear")
        return np.asarray(jnp.clip(jnp.round(out), 0, 255), np.uint8)

    def apply_coords(self, coords: np.ndarray, original_size) -> np.ndarray:
        oldh, oldw = original_size
        nh, nw = self.get_preprocess_shape(oldh, oldw, self.target_length)
        coords = np.asarray(coords, np.float64).copy()
        coords[..., 0] = coords[..., 0] * (nw / oldw)
        coords[..., 1] = coords[..., 1] * (nh / oldh)
        return coords

    def apply_boxes(self, boxes: np.ndarray, original_size) -> np.ndarray:
        boxes = self.apply_coords(
            np.asarray(boxes).reshape(-1, 2, 2), original_size)
        return boxes.reshape(-1, 4)
