"""Shared Flax building blocks for the SAM model zoo.

All modules use NHWC layout (TPU-native; XLA maps NHWC convs onto the MXU
without transposes) and bfloat16-friendly compute with float32 params.
Torch-side equivalents live in the reference's models/sam/modeling/common.py
and are NCHW; the checkpoint converter (convert.py) handles the transpose.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

import functools

# torch nn.GELU is the exact erf form; flax defaults to tanh-approximate
gelu = functools.partial(nn.gelu, approximate=False)


class LayerNorm2d(nn.Module):
    """Channel layer norm over NHWC feature maps (torch LayerNorm2d
    normalizes the channel dim of NCHW; same math, different layout)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        y = (xf - mu) / jnp.sqrt(var + 1e-6)
        return (y * w + b).astype(x.dtype)


class MLPBlock(nn.Module):
    """Linear -> act -> Linear (transformer feed-forward)."""

    mlp_dim: int
    out_dim: Optional[int] = None
    act: Callable = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_dim = self.out_dim or x.shape[-1]
        act = self.act or gelu
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x)
        h = act(h)
        return nn.Dense(out_dim, dtype=self.dtype, name="lin2")(h)


class Adapter(nn.Module):
    """Bottleneck adapter for PEFT (reference models/sam/modeling/common.py
    Adapter: down-project, act, up-project, optional residual skip)."""

    mlp_ratio: float = 0.25
    skip_connect: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = max(1, int(x.shape[-1] * self.mlp_ratio))
        h = nn.Dense(hidden, dtype=self.dtype, name="down")(x)
        h = gelu(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="up")(h)
        return x + h if self.skip_connect else h


class ConvBN(nn.Module):
    """Conv2d (no bias) + BatchNorm, the TinyViT workhorse
    (reference tiny_vit_sam.py Conv2d_BN:23-46). Inference uses running
    statistics; training updates them through flax mutable batch_stats."""

    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(self.padding, self.padding)] * 2,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="c")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        return x


def drop_path(x, rate: float, deterministic: bool, rng=None):
    """Stochastic depth; identity when deterministic or rate == 0."""
    if deterministic or rate == 0.0:
        return x
    import jax

    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x / keep * mask
