"""Interactive SAM predictor: embed an image once, prompt many times.

Parity with reference finetune-SAM/models/sam/predictor.py:17-270
(set_image / predict / get_image_embedding), built on the Flax Sam. The
encoder runs once per image under jit; each predict() call reuses the
cached embedding and runs only the prompt encoder + mask decoder.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.imaging import IMAGENET_MEAN, IMAGENET_STD
from .transforms import ResizeLongestSide


class SamPredictor:
    def __init__(self, model, variables):
        self.model = model
        self.variables = variables
        self.transform = ResizeLongestSide(model.image_size)
        self.reset_image()

        @jax.jit
        def _encode(image):
            return model.apply(variables, image, method=model.encode)

        @functools.partial(jax.jit, static_argnames=("multimask_output",))
        def _decode(embedding, point_coords, point_labels, boxes,
                    mask_input, multimask_output):
            def decode(mdl):
                points = (None if point_coords is None
                          else (point_coords, point_labels))
                sparse, dense = mdl.prompt_encoder(
                    points=points, boxes=boxes, masks=mask_input, batch_size=1)
                image_pe = mdl.prompt_encoder.get_dense_pe()
                return mdl.mask_decoder(embedding, image_pe, sparse, dense,
                                        multimask_output=multimask_output)

            return model.apply(variables, method=decode)

        self._encode = _encode
        self._decode = _decode

    def reset_image(self) -> None:
        self.is_image_set = False
        self.features = None
        self.original_size: Optional[Tuple[int, int]] = None
        self.input_size: Optional[Tuple[int, int]] = None

    def set_image(self, image: np.ndarray) -> None:
        """(H, W, 3) uint8 RGB -> cache the embedding."""
        self.original_size = image.shape[:2]
        resized = self.transform.apply_image(image)
        self.input_size = resized.shape[:2]
        s = self.model.image_size
        padded = np.zeros((s, s, 3), np.float32)
        padded[:resized.shape[0], :resized.shape[1]] = resized / 255.0
        normalized = (padded - IMAGENET_MEAN) / IMAGENET_STD
        self.features = self._encode(jnp.asarray(normalized)[None])
        self.is_image_set = True

    def get_image_embedding(self):
        if not self.is_image_set:
            raise RuntimeError("An image must be set with set_image(...)")
        return self.features

    def predict(self, point_coords: Optional[np.ndarray] = None,
                point_labels: Optional[np.ndarray] = None,
                box: Optional[np.ndarray] = None,
                mask_input: Optional[np.ndarray] = None,
                multimask_output: bool = True):
        """Returns (masks (K, H, W) bool, iou_predictions (K,),
        low_res_logits (K, 4*grid, 4*grid))."""
        if not self.is_image_set:
            raise RuntimeError("An image must be set with set_image(...)")

        pc = pl = bx = mi = None
        if point_coords is not None:
            pc = jnp.asarray(self.transform.apply_coords(
                point_coords, self.original_size), jnp.float32)[None]
            pl = jnp.asarray(point_labels, jnp.float32)[None]
        if box is not None:
            bx = jnp.asarray(self.transform.apply_boxes(
                box, self.original_size), jnp.float32)
        if mask_input is not None:
            mi = jnp.asarray(mask_input, jnp.float32)[None, ..., None]

        logits, iou = self._decode(self.features, pc, pl, bx, mi,
                                   multimask_output)
        logits = logits[0]  # (K, 4g, 4g)

        # upscale to model input size, crop the unpadded region, resize to
        # the original image (reference Sam.postprocess_masks)
        s = self.model.image_size
        up = jax.image.resize(
            logits, (logits.shape[0], s, s), method="bilinear")
        up = up[:, :self.input_size[0], :self.input_size[1]]
        full = jax.image.resize(
            up, (logits.shape[0],) + tuple(self.original_size),
            method="bilinear")
        masks = np.asarray(full) > 0.0
        return masks, np.asarray(iou[0]), np.asarray(logits)
