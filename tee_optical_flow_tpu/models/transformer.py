"""Two-way (token <-> image) decoder transformer in Flax.

Parity with reference finetune-SAM/models/sam/modeling/transformer.py:
TwoWayTransformer of depth 2 (:16-113), TwoWayAttentionBlock = token
self-attention, token->image cross-attention, MLP, image->token
cross-attention with post-norms (:116-207), and the downsampled Attention
(internal dim = embed/downsample_rate, :210-265). Optional adapters after
the MLP and i2t stages mirror the reference's PEFT hooks (:160-204).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from .common import Adapter, MLPBlock


class DownsampledAttention(nn.Module):
    """Multi-head attention projecting into embed/downsample_rate dims."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        internal = self.embedding_dim // self.downsample_rate
        head_dim = internal // self.num_heads
        qp = nn.Dense(internal, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(internal, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(internal, dtype=self.dtype, name="v_proj")(v)

        def split(x):
            b, n, _ = x.shape
            return jnp.swapaxes(x.reshape(b, n, self.num_heads, head_dim), 1, 2)

        qh, kh, vh = split(qp), split(kp), split(vp)
        attn = jnp.einsum("bhnd,bhmd->bhnm", qh, kh,
                          preferred_element_type=jnp.float32) / (head_dim ** 0.5)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        b = out.shape[0]
        out = jnp.swapaxes(out, 1, 2).reshape(b, -1, internal)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    use_adapter: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        # 1. token self-attention
        if self.skip_first_layer_pe:
            queries = DownsampledAttention(
                self.embedding_dim, self.num_heads, 1, dtype=self.dtype,
                name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            attn_out = DownsampledAttention(
                self.embedding_dim, self.num_heads, 1, dtype=self.dtype,
                name="self_attn")(q, q, queries)
            queries = queries + attn_out
        queries = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(queries)

        # 2. token -> image cross attention
        q = queries + query_pe
        k = keys + key_pe
        attn_out = DownsampledAttention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            dtype=self.dtype, name="cross_attn_token_to_image")(q, k, keys)
        queries = queries + attn_out
        queries = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(queries)

        # 3. MLP on tokens (the reference's TwoWayTransformer defaults to
        # ReLU here, unlike the encoder MLPs — transformer.py:24)
        mlp_out = MLPBlock(self.mlp_dim, act=nn.relu, dtype=self.dtype,
                           name="mlp")(queries)
        if self.use_adapter:
            mlp_out = Adapter(name="mlp_adapter")(mlp_out)
        queries = queries + mlp_out
        queries = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(queries)

        # 4. image -> token cross attention
        q = queries + query_pe
        k = keys + key_pe
        attn_out = DownsampledAttention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            dtype=self.dtype, name="cross_attn_image_to_token")(k, q, queries)
        keys = keys + attn_out
        keys = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    use_adapter: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """image_embedding/image_pe: (B, H, W, C); point_embedding (B, N, C).
        Returns (tokens (B, N, C), image (B, H*W, C))."""
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        # image_pe is (h, w, c) or (1, h, w, c): broadcast over the batch
        key_pe = jnp.broadcast_to(image_pe.reshape(-1, h * w, c), keys.shape)
        queries = point_embedding

        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim, self.num_heads, self.mlp_dim,
                self.attention_downsample_rate, skip_first_layer_pe=(i == 0),
                use_adapter=self.use_adapter, dtype=self.dtype,
                name=f"layer{i}")(queries, keys, point_embedding, key_pe)

        q = queries + point_embedding
        k = keys + key_pe
        attn_out = DownsampledAttention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            dtype=self.dtype, name="final_attn_token_to_image")(q, k, keys)
        queries = queries + attn_out
        queries = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                               name="norm_final_attn")(queries)
        return queries, keys
