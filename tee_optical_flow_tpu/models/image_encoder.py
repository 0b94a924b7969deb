"""ViT-Det image encoder (SAM vit_b / vit_l / vit_h) in Flax, NHWC.

Parity with reference finetune-SAM/models/sam/modeling/image_encoder.py:
16x16 patch embed, absolute position embedding, transformer blocks with
windowed attention (window 14) except at the global-attention indexes,
decomposed relative position bias (:246-422), optional PEFT adapters in
each block (:193-197, :226-242), and the 256-d neck.

The reference's manual 2-GPU block placement (image_encoder.py:99-104,
forward device hops :133-139) is intentionally absent: on TPU the same
capability is a mesh sharding of the block weights (parallel/), not
device-pinned Python.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import Adapter, LayerNorm2d, MLPBlock
from .tinyvit import _window_partition, _window_unpartition


def _rel_pos_embed(rel_pos: jnp.ndarray, q_size: int, k_size: int) -> jnp.ndarray:
    """Select (and if needed linearly resize) relative position embeddings
    for a q/k size pair -> (q_size, k_size, head_dim).

    The resize matches torch ``F.interpolate(mode='linear')`` exactly
    (half-pixel centers, NO anti-aliasing — the reference get_rel_pos,
    image_encoder.py:246+); ``jax.image.resize`` anti-aliases on
    downsample and would shift converted-checkpoint biases wherever the
    attended grid is smaller than the table (e.g. the thd depth grid)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    n = rel_pos.shape[0]
    if n != max_rel_dist:
        pos = jnp.clip((jnp.arange(max_rel_dist) + 0.5) * (n / max_rel_dist)
                       - 0.5, 0.0, n - 1.0)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n - 1)
        frac = (pos - lo)[:, None]
        rel_pos = rel_pos[lo] * (1.0 - frac) + rel_pos[hi] * frac
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


class RelPosAttention(nn.Module):
    """MHA with decomposed relative position bias. Input (B, H, W, C)."""

    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (14, 14)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))  # (3, B, heads, N, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * (head_dim ** -0.5)

        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.input_size[0] - 1, head_dim))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.input_size[1] - 1, head_dim))
            rh = _rel_pos_embed(rel_h, h, h)  # (h, h, hd)
            rw = _rel_pos_embed(rel_w, w, w)  # (w, w, hd)
            qr = q.reshape(b, self.num_heads, h, w, head_dim)
            bias_h = jnp.einsum("byhwc,hkc->byhwk", qr, rh)
            bias_w = jnp.einsum("byhwc,wkc->byhwk", qr, rw)
            bias = bias_h[..., :, None] + bias_w[..., None, :]
            attn = attn + bias.reshape(b, self.num_heads, h * w, h * w)

        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = jnp.swapaxes(out, 1, 2).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


def _closest_factors(n: int) -> Tuple[int, int]:
    """Factor pair (a, b), a <= b, a*b == n, closest to sqrt(n).

    Intentional divergence from the reference's ``closest_numbers``
    (image_encoder.py:424-433), which starts its search at (a, a+1) and so
    never returns a square pair — e.g. it gives (1, 4) for 4 and (2, 8)
    for 16 where this returns (2, 2) and (4, 4). The squarer grid gives
    the depth-attention rel-pos bias a more isotropic geometry; it means
    thd checkpoints trained with the reference grid are NOT
    weight-compatible on this branch (see NOTES.md divergences)."""
    a = int(np.sqrt(n))
    while n % a:
        a -= 1
    return a, n // a


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 14
    use_adapter: bool = False
    input_size: Tuple[int, int] = (64, 64)
    thd: bool = False
    chunk: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        shortcut = x
        norm1 = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")
        ws = self.window_size
        attn = RelPosAttention(self.dim, self.num_heads,
                               input_size=(ws, ws) if ws > 0 else (h, w),
                               dtype=self.dtype, name="attn")

        if self.thd:
            # 3D (thd) branch, after reference image_encoder.py:211-231:
            # attend over the depth/slice axis independently at every
            # spatial location, reusing the *same* attention weights by
            # arranging the chunk of `d` slices as a near-square dh x dw
            # grid; a no-skip Depth Adapter projects the result before it
            # is added to the spatial attention output. The leading axis
            # is (b d): a batch of b volumes chunked into d slices each.
            # Intentional divergence: for windowed blocks the reference
            # depth-attends the window-partitioned tensor (mixing depth
            # with window index in its einops split); here depth attention
            # always sees the full pre-partition feature map, which keeps
            # "depth" meaning depth at every spatial location. See
            # NOTES.md divergences.
            d = self.chunk
            if d <= 0 or b % d:
                raise ValueError(
                    f"thd branch needs batch ({b}) divisible by chunk ({d})")
            dh, dw = _closest_factors(d)
            # (b*d, h, w, c) -> (b*h*w, dh, dw, c)
            xd = x.reshape(b // d, d, h * w, c)
            xd = jnp.swapaxes(xd, 1, 2).reshape(-1, dh, dw, c)
            xd = norm1(xd)
            xd = Adapter(skip_connect=False, name="depth_adapter")(attn(xd))
            # back to (b*d, h, w, c)
            xd = xd.reshape(b // d, h * w, d, c)
            xd = jnp.swapaxes(xd, 1, 2).reshape(b, h, w, c)

        x = norm1(x)
        if ws > 0:
            wins, dims = _window_partition(x, ws)
            wins = wins.reshape(-1, ws, ws, c)
            wins = attn(wins)
            x = _window_unpartition(wins.reshape(-1, ws * ws, c), ws, b, h, w, dims)
        else:
            x = attn(x)
        if self.use_adapter:
            x = Adapter(name="space_adapter")(x)
        if self.thd:
            x = x + xd
        x = shortcut + x

        normed = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        mlp_out = MLPBlock(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                           name="mlp")(normed)
        if self.use_adapter:
            mlp_out = mlp_out + 0.5 * Adapter(
                skip_connect=False, name="mlp_adapter")(normed)
        return x + mlp_out


class ImageEncoderViT(nn.Module):
    """(B, S, S, 3) -> (B, S/16, S/16, 256)."""

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    adapter_blocks: Sequence[int] = ()
    thd: bool = False
    chunk: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, name="patch_embed")(x)
        grid = self.img_size // self.patch_size
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, grid, grid, self.embed_dim))
        x = x + pos

        for i in range(self.depth):
            ws = 0 if i in self.global_attn_indexes else self.window_size
            x = Block(self.embed_dim, self.num_heads, self.mlp_ratio,
                      window_size=ws, use_adapter=(i in self.adapter_blocks),
                      input_size=(grid, grid), thd=self.thd, chunk=self.chunk,
                      dtype=self.dtype, name=f"block{i}")(x, train)

        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype,
                    name="neck_conv1")(x)
        x = LayerNorm2d(name="neck_ln1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="neck_conv2")(x)
        x = LayerNorm2d(name="neck_ln2")(x)
        return x
