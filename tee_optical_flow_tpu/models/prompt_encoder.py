"""SAM prompt encoder in Flax (NHWC).

Parity with reference finetune-SAM/models/sam/modeling/prompt_encoder.py:
PositionEmbeddingRandom gaussian-fourier PE (:259-302), four point
embeddings + not-a-point (:132-134), box corners as two points, mask
downscaling conv stack (:138-146), and the ``no_mask_embed`` dense default
broadcast over the embedding grid (:252-254). The no-prompt path is the
one the pipeline exercises (evaluate_1_slice passes points=boxes=masks=
None, calculate_optical_flow.py:66-71).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import LayerNorm2d, gelu


class PositionEmbeddingRandom(nn.Module):
    """Gaussian random fourier features of normalized coordinates."""

    num_pos_feats: int = 128
    scale: float = 1.0

    @nn.compact
    def __call__(self, coords: jnp.ndarray) -> jnp.ndarray:
        """coords in [0, 1], shape (..., 2) -> (..., 2 * num_pos_feats)."""
        gauss = self.param(
            "positional_encoding_gaussian_matrix",
            lambda key, shape: self.scale * jnp.asarray(
                np.random.default_rng(0).normal(size=shape), jnp.float32),
            (2, self.num_pos_feats))
        c = 2.0 * coords - 1.0
        c = c @ gauss
        c = 2.0 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def grid(self, h: int, w: int) -> jnp.ndarray:
        """Dense PE for an (h, w) grid -> (h, w, 2*num_pos_feats)."""
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (h, w, 2) as (x, y)
        return self(grid)


class PromptAutoEncoder(nn.Module):
    """Image-conditioned prompt embeddings — API parity with the
    reference's unused ``PromptAutoEncoder`` (prompt_encoder.py:50-100):
    a small conv stack downsamples the image itself into the dense
    embedding (replacing hand prompts), sparse embeddings are empty.

    Faithful quirks mirrored from the torch module: the first 3x3 conv
    has NO padding (spatial shrinks by 2 before the stride-4 conv, so a
    1024^2 input yields a 255^2 dense grid, not 256^2 — the module is
    not wired into any reference pipeline), and the sparse output is a
    zero-width tensor.
    """

    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    embed_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        """images (B, H, W, C) -> (sparse (B, 0, D), dense (B, h', w', D))."""
        x = nn.Conv(self.mask_in_chans // 4, (3, 3), padding="VALID",
                    dtype=self.dtype, name="down_conv1")(images)
        x = gelu(LayerNorm2d(name="down_ln1")(x))
        x = nn.Conv(self.mask_in_chans, (4, 4), strides=(4, 4),
                    padding="VALID", dtype=self.dtype, name="down_conv2")(x)
        x = gelu(LayerNorm2d(name="down_ln2")(x))
        dense = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                        name="down_conv3")(x)
        sparse = jnp.zeros((images.shape[0], 0, self.embed_dim),
                           jnp.float32)
        return sparse, dense


class PromptEncoder(nn.Module):
    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        # 0/1: negative/positive point, 2/3: box corners
        self.point_embeddings = [
            self.param(f"point_embed_{i}", nn.initializers.normal(1.0),
                       (1, self.embed_dim)) for i in range(4)]
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, self.embed_dim))
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim))
        self.mask_conv1 = nn.Conv(self.mask_in_chans // 4, (2, 2), strides=(2, 2),
                                  dtype=self.dtype, name="mask_conv1")
        self.mask_ln1 = LayerNorm2d(name="mask_ln1")
        self.mask_conv2 = nn.Conv(self.mask_in_chans, (2, 2), strides=(2, 2),
                                  dtype=self.dtype, name="mask_conv2")
        self.mask_ln2 = LayerNorm2d(name="mask_ln2")
        self.mask_conv3 = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                                  name="mask_conv3")

    def get_dense_pe(self) -> jnp.ndarray:
        h, w = self.image_embedding_size
        return self.pe_layer.grid(h, w)  # (h, w, embed_dim)

    def _embed_points(self, points, labels, pad: bool):
        points = points + 0.5  # pixel center
        if pad:
            points = jnp.concatenate(
                [points, jnp.zeros((points.shape[0], 1, 2))], axis=1)
            labels = jnp.concatenate(
                [labels, -jnp.ones((labels.shape[0], 1))], axis=1)
        coords = points / jnp.asarray(
            [self.input_image_size[1], self.input_image_size[0]], jnp.float32)
        pe = self.pe_layer(coords)
        lab = labels[..., None]
        pe = jnp.where(lab == -1, self.not_a_point_embed[0], pe)
        pe = jnp.where(lab == 0, pe + self.point_embeddings[0][0], pe)
        pe = jnp.where(lab == 1, pe + self.point_embeddings[1][0], pe)
        return pe

    def _embed_boxes(self, boxes):
        boxes = boxes + 0.5
        corners = boxes.reshape(-1, 2, 2)
        coords = corners / jnp.asarray(
            [self.input_image_size[1], self.input_image_size[0]], jnp.float32)
        pe = self.pe_layer(coords)
        pe = pe.at[:, 0, :].add(self.point_embeddings[2][0])
        pe = pe.at[:, 1, :].add(self.point_embeddings[3][0])
        return pe

    def _embed_masks(self, masks):
        x = self.mask_conv1(masks)
        x = self.mask_ln1(x)
        x = gelu(x)
        x = self.mask_conv2(x)
        x = self.mask_ln2(x)
        x = gelu(x)
        return self.mask_conv3(x)

    def __call__(self, points=None, boxes=None, masks=None,
                 batch_size: int = 1):
        """Returns (sparse (B, N, D), dense (B, h, w, D))."""
        bs = batch_size
        if points is not None:
            bs = points[0].shape[0]
        elif boxes is not None:
            bs = boxes.shape[0]
        elif masks is not None:
            bs = masks.shape[0]

        if self.is_initializing():
            # materialize every submodule's params regardless of which
            # prompt kinds this first call uses, so checkpoint conversion
            # always finds the full tree
            gh, gw = self.image_embedding_size
            _ = self.pe_layer(jnp.zeros((1, 2), jnp.float32))
            _ = self._embed_masks(jnp.zeros((1, 4 * gh, 4 * gw, 1), jnp.float32))

        sparse = jnp.zeros((bs, 0, self.embed_dim), jnp.float32)
        if points is not None:
            coords, labels = points
            sparse = jnp.concatenate(
                [sparse, self._embed_points(coords, labels, pad=(boxes is None))],
                axis=1)
        if boxes is not None:
            sparse = jnp.concatenate([sparse, self._embed_boxes(boxes)], axis=1)

        h, w = self.image_embedding_size
        if masks is not None:
            dense = self._embed_masks(masks)
        else:
            dense = jnp.broadcast_to(
                self.no_mask_embed.reshape(1, 1, 1, self.embed_dim),
                (bs, h, w, self.embed_dim))
        return sparse, dense
