"""SAM mask decoder with hypernetwork heads, in Flax (NHWC).

Parity with reference finetune-SAM/models/sam/modeling/mask_decoder.py:
iou token + (num_multimask_outputs + 1) mask tokens (:139-141), two
ConvTranspose 2x upscaling stages with LayerNorm2d/GELU (:143-149),
per-token 3-layer hypernetwork MLPs whose outputs dot the upscaled
embedding (:150-155, :202-242), iou-prediction MLP head, and the
multimask slice [1:] used by the pipeline (sam.py:118-124; the
fine-tuning scripts always run multimask with num_multimask_outputs =
num_classes, build_sam.py:85-97).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from .common import LayerNorm2d, gelu
from .transformer import TwoWayTransformer


class MLP(nn.Module):
    """num_layers-deep ReLU MLP (reference mask_decoder.py:247-269)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layer{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


class MaskDecoder(nn.Module):
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    use_adapter: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt_embeddings,
                 dense_prompt_embeddings, multimask_output: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """image_embeddings (B, h, w, C) NHWC; image_pe (h, w, C);
        sparse (B, N, C); dense (B, h, w, C).
        Returns (masks (B, K, 4h, 4w), iou_pred (B, K))."""
        num_mask_tokens = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, self.transformer_dim))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (num_mask_tokens, self.transformer_dim))

        b = sparse_prompt_embeddings.shape[0]
        output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        output_tokens = jnp.broadcast_to(
            output_tokens[None], (b,) + output_tokens.shape)
        tokens = jnp.concatenate([output_tokens, sparse_prompt_embeddings], axis=1)

        src = image_embeddings + dense_prompt_embeddings
        hs, src_out = TwoWayTransformer(
            depth=2, embedding_dim=self.transformer_dim, num_heads=8,
            mlp_dim=2048, use_adapter=self.use_adapter, dtype=self.dtype,
            name="transformer")(src, image_pe[None], tokens)

        iou_token_out = hs[:, 0, :]
        mask_tokens_out = hs[:, 1:1 + num_mask_tokens, :]

        h, w = image_embeddings.shape[1], image_embeddings.shape[2]
        src_img = src_out.reshape(b, h, w, self.transformer_dim)
        x = nn.ConvTranspose(self.transformer_dim // 4, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="upscale_conv1")(src_img)
        x = LayerNorm2d(name="upscale_ln")(x)
        x = gelu(x)
        x = nn.ConvTranspose(self.transformer_dim // 8, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="upscale_conv2")(x)
        upscaled = gelu(x)  # (B, 4h, 4w, C/8)

        hyper_in = jnp.stack([
            MLP(self.transformer_dim, self.transformer_dim // 8, 3,
                dtype=self.dtype, name=f"hypernet_{i}")(mask_tokens_out[:, i, :])
            for i in range(num_mask_tokens)
        ], axis=1)  # (B, K, C/8)

        masks = jnp.einsum("bkc,bhwc->bkhw", hyper_in, upscaled,
                           preferred_element_type=jnp.float32)

        iou_pred = MLP(self.iou_head_hidden_dim, num_mask_tokens,
                       self.iou_head_depth, dtype=self.dtype,
                       name="iou_prediction_head")(iou_token_out)

        if multimask_output:
            return masks[:, 1:, :, :], iou_pred[:, 1:]
        return masks[:, :1, :, :], iou_pred[:, :1]
