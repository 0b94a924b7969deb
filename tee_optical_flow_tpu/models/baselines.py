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
        "tag": lambda: TAG(num_classes=num_classes, **kw),
        # implicit critics take (seg, label, natural) — see class docs
        "implicitnet": lambda: ImplicitNet(**kw),
        "implicitefficientnet": lambda: ImplicitEfficientNet(**kw),
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


# ---------------------------------------------------------------------------
# TAG part-token transformer + implicit realism nets (the last three
# reference baselines: models/tag/tag.py:243 + tag_layers.py,
# implicitnet.py:43, implicitefficientnet.py:113)
# ---------------------------------------------------------------------------


class _AnyAttention(nn.Module):
    """Cross/self attention over arbitrary token sets with optional
    additive per-head positional terms (reference tag_layers.py
    AnyAttention:75 + apply_pos:11): q/k/v each layer-normed then
    linearly projected, per-head dot-product attention, output proj."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, q, k, v, qpos=None, kpos=None):
        hd = self.dim // self.num_heads

        def add_pos(t, pos):
            # reference apply_pos (tag_layers.py:11): pos (N, 1, hd)
            # broadcasts over batch and heads in per-head layout
            b, n, _ = t.shape
            th = t.reshape(b, n, self.num_heads, hd) + pos[None, :, :, :]
            return th.reshape(b, n, self.dim)

        if qpos is not None:
            q = add_pos(q, qpos)
        if kpos is not None:
            k = add_pos(k, kpos)
        q = nn.LayerNorm(name="norm_q")(q)
        k = nn.LayerNorm(name="norm_k")(k)
        v = nn.LayerNorm(name="norm_v")(v)
        q = nn.Dense(self.dim, use_bias=False, name="to_q")(q)
        k = nn.Dense(self.dim, use_bias=False, name="to_k")(k)
        v = nn.Dense(self.dim, use_bias=False, name="to_v")(v)
        b = q.shape[0]
        qh = q.reshape(b, -1, self.num_heads, hd)
        kh = k.reshape(b, -1, self.num_heads, hd)
        vh = v.reshape(b, -1, self.num_heads, hd)
        attn = jnp.einsum("bqgc,bkgc->bqgk", qh, kh) * (hd ** -0.5)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bqgk,bkgc->bqgc", attn, vh).reshape(b, -1, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class _SimpleReasoning(nn.Module):
    """Residual token-mixing over the part axis (tag_layers.py:63)."""

    num_parts: int

    @nn.compact
    def __call__(self, x):
        t = nn.LayerNorm(name="norm")(x)
        # 1x1 Conv1d over the token axis == dense mixing of parts
        t = jnp.einsum("pq,bqc->bpc",
                       self.param("mix", nn.initializers.lecun_normal(),
                                  (self.num_parts, self.num_parts)), t)
        return x + t


class _TagMlp(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(name="norm")(x)
        x = nn.gelu(nn.Dense(self.hidden, name="fc1")(x))
        return nn.Dense(self.dim, name="fc2")(x)


class TAGStage(nn.Module):
    """One TAG stage (reference tag.py Stage:133): depthwise-conv patch
    embedding of the feature map, part tokens projected to the stage
    width, then decoder blocks broadcasting part information back into
    the features (x cross-attends the parts; reference tag.py
    Decoder:73 — the stage-level Encoder and patch-local attention are
    commented out in the reference and therefore omitted). The final
    stage can instead pool INTO the parts (last_enc: Encoder:44 with
    SimpleReasoning) for classification.

    Divergence note: the reference's ``to_part`` pushes the (B, N, C)
    part tokens through a Conv2d patch embed, which cannot run on a 3-D
    tensor — dead-as-shipped upstream code. The intended projection (its
    commented-out ``proj_token``: token mix + Linear + Norm) is what this
    implements.
    """

    out_ch: int
    num_blocks: int
    num_heads: int
    num_enc_heads: int
    stride: int
    num_parts: int
    ffn_exp: int = 3
    last_enc: bool = False

    @nn.compact
    def __call__(self, x, parts):
        b, h, w, c = x.shape
        hd = self.out_ch // self.num_heads
        # patch embed: depthwise 3x3 (stride) + linear proj + norm
        x = nn.Conv(c, (3, 3), strides=(self.stride, self.stride),
                    padding=1, feature_group_count=c, name="to_token")(x)
        nh, nw = x.shape[1], x.shape[2]
        x = nn.Dense(self.out_ch, use_bias=False, name="proj_x")(
            x.reshape(b, nh * nw, c))
        x = nn.LayerNorm(name="proj_norm")(x)
        # part projection (see divergence note)
        parts = nn.LayerNorm(name="part_norm")(
            nn.Dense(self.out_ch, use_bias=False, name="proj_token")(parts))

        qpos = self.param("rpn_qpos", nn.initializers.truncated_normal(0.02),
                          (self.num_parts, 1, hd))
        kpos = self.param("rpn_kpos", nn.initializers.truncated_normal(0.02),
                          (self.num_parts, 1, hd))
        for i in range(self.num_blocks):
            attn = _AnyAttention(self.out_ch, self.num_heads,
                                 name=f"blk{i}_attn")(
                q=x, k=parts, v=parts, qpos=None, kpos=qpos)
            x = x + attn
            x = x + _TagMlp(self.out_ch, self.out_ch * self.ffn_exp,
                            name=f"blk{i}_ffn")(x)
        if self.last_enc:
            enc = _AnyAttention(self.out_ch, self.num_enc_heads,
                                name="last_enc_attn")(
                q=parts, k=x, v=x, qpos=qpos, kpos=None)
            parts = parts + enc
            parts = _SimpleReasoning(self.num_parts, name="last_enc_reason")(
                parts)
            return parts, parts
        return x.reshape(b, nh, nw, self.out_ch), parts


class TAG(nn.Module):
    """TAG part-token classifier (reference models/tag/tag.py:243,
    TAG_tiny config tag.py:387: stem 7x7/2 + maxpool/2, four stages with
    learned part tokens, last-stage encoder pooling into the parts, mean
    over parts -> fc head)."""

    num_classes: int = 1000
    inplanes: int = 64
    num_chs: Sequence[int] = (64, 128, 256, 512)
    num_layers: Sequence[int] = (1, 1, 2, 1)
    num_strides: Sequence[int] = (1, 2, 2, 2)
    num_heads: Sequence[int] = (1, 2, 4, 8)
    num_enc_heads: Sequence[int] = (1, 2, 4, 8)
    num_parts: Sequence[int] = (32, 32, 32, 32)
    has_last_encoder: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = nn.Conv(self.inplanes, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, name="norm1")(x)
        x = nn.gelu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        parts = jnp.tile(
            self.param("rpn_tokens", nn.initializers.truncated_normal(0.02),
                       (1, self.num_parts[0], self.inplanes)), (b, 1, 1))
        for i in range(len(self.num_layers)):
            last = self.has_last_encoder and i == len(self.num_layers) - 1
            x, parts = TAGStage(
                out_ch=self.num_chs[i], num_blocks=self.num_layers[i],
                num_heads=self.num_heads[i],
                num_enc_heads=self.num_enc_heads[i],
                stride=self.num_strides[i], num_parts=self.num_parts[i],
                last_enc=last, name=f"layer_{i}")(x, parts)
        if self.has_last_encoder:
            out = jnp.mean(nn.gelu(x), axis=1)
        else:
            x = nn.Conv(self.num_chs[-1], (1, 1), use_bias=False,
                        name="last_linear")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name="last_norm")(x)
            out = jnp.mean(nn.gelu(x), axis=(1, 2))
        return nn.Dense(self.num_classes, name="last_fc")(out)


class _LinearBottleneck(nn.Module):
    """MobileNetV2-style inverted residual (reference implicitnet.py
    LinearBottleNeck:10)."""

    out_ch: int
    stride: int
    t: int = 6

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        h = nn.Conv(in_ch * self.t, (1, 1), name="expand")(x)
        h = nn.BatchNorm(use_running_average=not train, name="bn1")(h)
        h = jnp.minimum(nn.relu(h), 6.0)
        h = nn.Conv(in_ch * self.t, (3, 3),
                    strides=(self.stride, self.stride), padding=1,
                    feature_group_count=in_ch * self.t, name="dw")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn2")(h)
        h = jnp.minimum(nn.relu(h), 6.0)
        h = nn.Conv(self.out_ch, (1, 1), name="proj")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn3")(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class ImplicitNet(nn.Module):
    """Implicit per-pixel realism critic (reference implicitnet.py:43):
    concatenates a broadcast class label, the natural image and the
    segmentation into a 5-channel input, runs a MobileNetV2-style trunk
    and emits a sigmoid map."""

    @nn.compact
    def __call__(self, seg, label, natural, train: bool = False):
        b, h, w, _ = seg.shape
        lab = jnp.broadcast_to(label.reshape(b, 1, 1, 1), (b, h, w, 1))
        x = jnp.concatenate([lab, natural, seg], axis=-1)
        x = nn.Conv(32, (1, 1), padding=1, name="pre")(x)
        x = nn.BatchNorm(use_running_average=not train, name="pre_bn")(x)
        x = jnp.minimum(nn.relu(x), 6.0)
        cfg = [  # (repeat, out_ch, stride, t) — implicitnet.py:53-60
            (1, 16, 1, 1), (2, 24, 2, 6), (3, 32, 2, 6), (4, 64, 2, 6),
            (3, 96, 1, 6), (3, 160, 1, 6), (1, 320, 1, 6)]
        for si, (rep, ch, stride, t) in enumerate(cfg):
            for r in range(rep):
                x = _LinearBottleneck(ch, stride if r == 0 else 1, t,
                                      name=f"s{si}_b{r}")(x, train)
        x = nn.Conv(1280, (1, 1), name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, name="conv1_bn")(x)
        x = jnp.minimum(nn.relu(x), 6.0)
        return nn.sigmoid(nn.Conv(1, (1, 1), name="conv2")(x))


class ImplicitEfficientNet(nn.Module):
    """EfficientNet-trunk implicit critic (reference
    implicitefficientnet.py:113): 5-channel stem over (label, natural,
    seg), MBConv trunk, head selected by ``head_type`` — 'map' (sigmoid
    realism map), 'img' (3-channel reconstruction), or 'feature' (gram
    matrix of centered features for a style-type loss)."""

    head_type: str = "map"
    widths: Sequence[int] = (16, 24, 40, 80)

    @nn.compact
    def __call__(self, seg, label, natural, train: bool = False):
        b, h, w, _ = seg.shape
        lab = jnp.broadcast_to(label.reshape(b, 1, 1, 1), (b, h, w, 1))
        x = jnp.concatenate([lab, natural, seg], axis=-1)
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
        if self.head_type == "feature":
            f = x.reshape(b, -1, x.shape[-1])
            f = f - jnp.mean(f, axis=1, keepdims=True)
            return jnp.einsum("bnc,bnd->bcd", f, f) / f.shape[1]
        if self.head_type == "img":
            for i, ch in enumerate((448, 112)):
                bb, hh, ww, _ = x.shape
                x = jax.image.resize(x, (bb, hh * 2, ww * 2, x.shape[-1]),
                                     "nearest")
                x = nn.Conv(ch, (3, 3), padding=1, name=f"up{i}")(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 name=f"up{i}_bn")(nn.relu(x))
            return nn.sigmoid(nn.Conv(3, (1, 1), name="head_img")(x))
        return nn.sigmoid(nn.Conv(1, (1, 1), name="head_map")(x))
