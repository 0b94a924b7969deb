"""Baseline segmentation/classification nets carried by the reference.

The reference vendors a zoo of baselines from its upstream fork
(finetune-SAM/models/: UNet/TransUNet variants unet/unet_model.py:83-516,
ResNet resnet.py:80, VGG vgg.py:21, EfficientNet efficientnet.py:199,
SEResNet senet.py:110, SqueezeNet squeezenet.py:40, VanillaVAE vae.py:9,
GAN Discriminator discriminator.py:44). They are unused by the pipeline
but part of the surface; these are compact NHWC Flax equivalents behind
the same ``get_network`` style factory (reference utils/utils.py:114).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class DoubleConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    """Classic encoder/decoder UNet (reference unet/unet_model.py UNet)."""

    num_classes: int = 2
    base: int = 64
    depth: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        f = self.base
        for d in range(self.depth):
            x = DoubleConv(f, name=f"down{d}")(x, train)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            f *= 2
        x = DoubleConv(f, name="bottleneck")(x, train)
        for d in reversed(range(self.depth)):
            f //= 2
            b, h, w, _ = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, x.shape[-1]), "nearest")
            x = nn.Conv(f, (2, 2), padding="SAME", name=f"upconv{d}")(x)
            x = jnp.concatenate([skips[d], x], axis=-1)
            x = DoubleConv(f, name=f"up{d}")(x, train)
        return nn.Conv(self.num_classes, (1, 1), name="head")(x)


class ResBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2")(y)
        if x.shape != y.shape:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, name="proj")(x)
            x = nn.BatchNorm(use_running_average=not train, name="bnp")(x)
        return nn.relu(x + y)


class SEBlock(nn.Module):
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))
        s = nn.relu(nn.Dense(max(1, c // self.reduction), name="fc1")(s))
        s = nn.sigmoid(nn.Dense(c, name="fc2")(s))
        return x * s[:, None, None, :]


class ResNet(nn.Module):
    """ResNet-18-style classifier (reference resnet.py:80)."""

    num_classes: int = 2
    stages: Sequence[int] = (2, 2, 2, 2)
    use_se: bool = False  # SEResNet variant (reference senet.py:110)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        f = 64
        for s, blocks in enumerate(self.stages):
            for i in range(blocks):
                stride = 2 if (s > 0 and i == 0) else 1
                x = ResBlock(f, stride, name=f"s{s}b{i}")(x, train)
                if self.use_se:
                    x = SEBlock(name=f"s{s}se{i}")(x)
            f *= 2
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="head")(x)


class VGG(nn.Module):
    """VGG-11-style classifier (reference vgg.py:21)."""

    num_classes: int = 2
    cfg: Sequence = (64, "M", 128, "M", 256, 256, "M", 512, 512, "M")

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, c in enumerate(self.cfg):
            if c == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(c, (3, 3), padding=1, name=f"conv{i}")(x)
                x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.relu(nn.Dense(512, name="fc1")(x))
        return nn.Dense(self.num_classes, name="head")(x)


class SqueezeNet(nn.Module):
    """Fire-module classifier (reference squeezenet.py:40)."""

    num_classes: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        def fire(x, squeeze, expand, name):
            s = nn.relu(nn.Conv(squeeze, (1, 1), name=f"{name}_s")(x))
            e1 = nn.relu(nn.Conv(expand, (1, 1), name=f"{name}_e1")(s))
            e3 = nn.relu(nn.Conv(expand, (3, 3), padding=1, name=f"{name}_e3")(s))
            return jnp.concatenate([e1, e3], axis=-1)

        x = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2), name="stem")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = fire(x, 16, 64, "f1")
        x = fire(x, 16, 64, "f2")
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = fire(x, 32, 128, "f3")
        x = fire(x, 32, 128, "f4")
        x = nn.Conv(self.num_classes, (1, 1), name="head")(x)
        return jnp.mean(x, axis=(1, 2))


class EfficientNetLite(nn.Module):
    """MBConv classifier in the EfficientNet family
    (reference efficientnet.py:199)."""

    num_classes: int = 2
    widths: Sequence[int] = (16, 24, 40, 80)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, name="stem_bn")(x)
        x = nn.swish(x)
        for i, wdt in enumerate(self.widths):
            hidden = x.shape[-1] * 4
            y = nn.Conv(hidden, (1, 1), use_bias=False, name=f"m{i}_expand")(x)
            y = nn.swish(nn.BatchNorm(use_running_average=not train,
                                      name=f"m{i}_bn1")(y))
            y = nn.Conv(hidden, (3, 3), strides=(2, 2), padding=1,
                        feature_group_count=hidden, use_bias=False,
                        name=f"m{i}_dw")(y)
            y = nn.swish(nn.BatchNorm(use_running_average=not train,
                                      name=f"m{i}_bn2")(y))
            y = SEBlock(reduction=4, name=f"m{i}_se")(y)
            y = nn.Conv(wdt, (1, 1), use_bias=False, name=f"m{i}_proj")(y)
            x = nn.BatchNorm(use_running_average=not train, name=f"m{i}_bn3")(y)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="head")(x)


class VanillaVAE(nn.Module):
    """Conv VAE (reference vae.py:9). __call__ -> (recon, mu, logvar)."""

    latent_dim: int = 128
    hidden: Sequence[int] = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, x, rng=None, train: bool = False):
        b = x.shape[0]
        in_hw = x.shape[1]
        in_c = x.shape[-1]
        h = x
        for i, c in enumerate(self.hidden):
            h = nn.Conv(c, (3, 3), strides=(2, 2), padding=1, name=f"enc{i}")(h)
            h = nn.leaky_relu(h)
        enc_hw = h.shape[1]
        flat = h.reshape(b, -1)
        mu = nn.Dense(self.latent_dim, name="mu")(flat)
        logvar = nn.Dense(self.latent_dim, name="logvar")(flat)
        if rng is not None:
            eps = jax.random.normal(rng, mu.shape)
            z = mu + jnp.exp(0.5 * logvar) * eps
        else:
            z = mu
        h = nn.Dense(enc_hw * enc_hw * self.hidden[-1], name="dec_in")(z)
        h = h.reshape(b, enc_hw, enc_hw, self.hidden[-1])
        for i, c in enumerate(reversed(self.hidden[:-1])):
            bb, hh, ww, _ = h.shape
            h = jax.image.resize(h, (bb, hh * 2, ww * 2, h.shape[-1]), "nearest")
            h = nn.leaky_relu(nn.Conv(c, (3, 3), padding=1, name=f"dec{i}")(h))
        bb, hh, ww, _ = h.shape
        h = jax.image.resize(h, (bb, in_hw, in_hw, h.shape[-1]), "nearest")
        recon = nn.tanh(nn.Conv(in_c, (3, 3), padding=1, name="dec_out")(h))
        return recon, mu, logvar


class Discriminator(nn.Module):
    """PatchGAN-style discriminator (reference discriminator.py:44)."""

    base: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.base
        for i in range(4):
            x = nn.Conv(f, (4, 4), strides=(2, 2), padding=1, name=f"d{i}")(x)
            x = nn.leaky_relu(x, 0.2)
            f *= 2
        # SAME padding: VALID with a 4x4 head would collapse small inputs
        # to an empty map (and a NaN mean)
        return nn.Conv(1, (4, 4), padding="SAME", name="head")(x)


def get_network(name: str, num_classes: int = 2, **kw):
    """Factory matching the reference's get_network dispatch
    (utils/utils.py:114)."""
    table = {
        "unet": lambda: UNet(num_classes=num_classes, **kw),
        "transunet": lambda: TransUNet(num_classes=num_classes, **kw),
        "munet": lambda: MUNet(num_classes=num_classes, **kw),
        "goinnet": lambda: GoinNet(num_classes=num_classes, **kw),
        "vit": lambda: ViTEncoder(**kw),
        "resnet": lambda: ResNet(num_classes=num_classes, **kw),
        "seresnet": lambda: ResNet(num_classes=num_classes, use_se=True, **kw),
        "vgg": lambda: VGG(num_classes=num_classes, **kw),
        "squeezenet": lambda: SqueezeNet(num_classes=num_classes, **kw),
        "efficientnet": lambda: EfficientNetLite(num_classes=num_classes, **kw),
        "vae": lambda: VanillaVAE(**kw),
        "discriminator": lambda: Discriminator(**kw),
    }
    if name not in table:
        raise ValueError(f"unknown network {name!r}; choose from {sorted(table)}")
    return table[name]()


class ViTEncoder(nn.Module):
    """Small generic ViT (reference models/sam/modeling/vit.py:19-135:
    patch embedding + standard pre-norm transformer encoder). Used by
    SmallDecoder and standalone as a classifier backbone."""

    dim: int = 256
    depth: int = 4
    heads: int = 8
    patch: int = 8
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), name="patch_embed")(x)
        hh, ww = x.shape[1], x.shape[2]
        tokens = x.reshape(b, hh * ww, self.dim)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, hh * ww, self.dim))
        tokens = tokens + pos
        for i in range(self.depth):
            y = nn.LayerNorm(name=f"ln1_{i}")(tokens)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, name=f"attn_{i}")(y, y)
            tokens = tokens + y
            y = nn.LayerNorm(name=f"ln2_{i}")(tokens)
            y = nn.Dense(int(self.dim * self.mlp_ratio), name=f"fc1_{i}")(y)
            y = nn.gelu(y)
            y = nn.Dense(self.dim, name=f"fc2_{i}")(y)
            tokens = tokens + y
        return tokens.reshape(b, hh, ww, self.dim)


class SmallDecoder(nn.Module):
    """Segmenter-style mask decoder alternative (reference
    models/sam/modeling/mask_decoder.py SmallDecoder:18-102): class tokens
    attend over image tokens through a small transformer; masks come from
    token/patch dot products."""

    num_classes: int = 2
    dim: int = 256
    depth: int = 2
    heads: int = 8

    @nn.compact
    def __call__(self, image_embeddings, train: bool = False):
        b, h, w, c = image_embeddings.shape
        tokens = image_embeddings.reshape(b, h * w, c)
        if c != self.dim:
            tokens = nn.Dense(self.dim, name="proj_in")(tokens)
        cls = self.param("cls_tokens", nn.initializers.normal(0.02),
                         (self.num_classes, self.dim))
        cls = jnp.broadcast_to(cls[None], (b, self.num_classes, self.dim))
        seq = jnp.concatenate([cls, tokens], axis=1)
        for i in range(self.depth):
            y = nn.LayerNorm(name=f"ln1_{i}")(seq)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, name=f"attn_{i}")(y, y)
            seq = seq + y
            y = nn.LayerNorm(name=f"ln2_{i}")(seq)
            y = nn.Dense(self.dim * 4, name=f"fc1_{i}")(y)
            y = nn.gelu(y)
            y = nn.Dense(self.dim, name=f"fc2_{i}")(y)
            seq = seq + y
        cls_out = seq[:, :self.num_classes]           # (B, K, D)
        patch_out = seq[:, self.num_classes:]         # (B, HW, D)
        masks = jnp.einsum("bkd,bnd->bkn", cls_out, patch_out)
        return masks.reshape(b, self.num_classes, h, w)


class _ResNetEncoder(nn.Module):
    """Shared ResNet-34-style encoder with skip taps (the backbone the
    reference's TransUNet/MUNet/GoinNet wrap, unet/unet_model.py:83-516)."""

    stages: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, name="stem_bn")(x)
        x = nn.relu(x)
        skips.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        f = 64
        for s, blocks in enumerate(self.stages):
            for i in range(blocks):
                stride = 2 if (s > 0 and i == 0) else 1
                x = ResBlock(f, stride, name=f"s{s}b{i}")(x, train)
            skips.append(x)
            f *= 2
        return x, skips


class TransUNet(nn.Module):
    """ResNet-encoder UNet with a transformer bottleneck
    (reference unet/unet_model.py TransUNet:83)."""

    num_classes: int = 2
    trans_depth: int = 2
    trans_heads: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        bottom, skips = _ResNetEncoder(name="encoder")(x, train)
        b, h, w, c = bottom.shape
        tokens = bottom.reshape(b, h * w, c)
        for i in range(self.trans_depth):
            y = nn.LayerNorm(name=f"t_ln1_{i}")(tokens)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.trans_heads, name=f"t_attn_{i}")(y, y)
            tokens = tokens + y
            y = nn.LayerNorm(name=f"t_ln2_{i}")(tokens)
            y = nn.Dense(c * 2, name=f"t_fc1_{i}")(y)
            y = nn.gelu(y)
            y = nn.Dense(c, name=f"t_fc2_{i}")(y)
            tokens = tokens + y
        x = tokens.reshape(b, h, w, c)
        for d, skip in enumerate(reversed(skips[:-1])):
            bb, hh, ww, _ = x.shape
            x = jax.image.resize(x, (bb, skip.shape[1], skip.shape[2],
                                     x.shape[-1]), "nearest")
            x = nn.Conv(skip.shape[-1], (3, 3), padding=1, name=f"up{d}")(x)
            x = nn.relu(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = nn.Conv(skip.shape[-1], (3, 3), padding=1, name=f"fuse{d}")(x)
            x = nn.relu(x)
        bb, hh, ww, _ = x.shape
        in_h, in_w = bb and x.shape[1] * 2, x.shape[2] * 2
        x = jax.image.resize(x, (bb, in_h, in_w, x.shape[-1]), "nearest")
        return nn.Conv(self.num_classes, (1, 1), name="head")(x)


class MUNet(nn.Module):
    """ResNet-encoder UNet (no transformer bottleneck) — the reference's
    MUNet variant (unet/unet_model.py:274)."""

    num_classes: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        return TransUNet(num_classes=self.num_classes, trans_depth=0,
                         name="core")(x, train)


class GoinNet(nn.Module):
    """ResNet-UNet emitting segmentation plus an auxiliary global
    classification head (reference unet/unet_model.py GoinNet:427)."""

    num_classes: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        bottom, _ = _ResNetEncoder(name="encoder")(x, train)
        seg = TransUNet(num_classes=self.num_classes, trans_depth=1,
                        name="seg")(x, train)
        aux = nn.Dense(self.num_classes, name="aux_head")(
            jnp.mean(bottom, axis=(1, 2)))
        return seg, aux
