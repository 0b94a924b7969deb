"""Torch SAM checkpoint -> Flax variables converter.

The reference loads torch state dicts with key surgery for image-size
mismatches (build_sam.py:230-262 load_from / load_from_mobile); this
module maps those state dicts onto the Flax module trees defined in this
package, handling the layout differences:

  torch Conv2d  weight (O, I, kH, kW)   -> flax Conv kernel (kH, kW, I, O)
  torch depthwise Conv2d (C, 1, k, k)   -> flax kernel (k, k, 1, C)
  torch ConvTranspose2d (I, O, k, k)    -> flax ConvTranspose kernel
                                           (k, k, O, I) with transpose_kernel
                                           semantics resolved numerically in
                                           tests (flipped spatially)
  torch Linear weight (O, I)            -> flax Dense kernel (I, O)
  torch BatchNorm                       -> params.bn.{scale,bias} +
                                           batch_stats.bn.{mean,var}

Numerical parity of the full conversion is asserted in
tests/test_convert_parity.py against the reference torch model executed
with random weights.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

from ..exceptions import CheckpointError


def _t(x) -> np.ndarray:
    import torch

    if isinstance(x, torch.Tensor):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _conv(x):      # (O, I, kH, kW) -> (kH, kW, I, O)
    return _t(x).transpose(2, 3, 1, 0)


def _dense(x):     # (O, I) -> (I, O)
    return _t(x).transpose(1, 0)


def _convT(x):     # torch (I, O, k, k) -> flax (k, k, I, O), spatially flipped
    w = _t(x).transpose(2, 3, 0, 1)
    return w[::-1, ::-1].copy()


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        raise CheckpointError(f"Unknown param path {'/'.join(path)}")
    if tuple(node[leaf].shape) != tuple(value.shape):
        raise CheckpointError(
            f"Shape mismatch at {'/'.join(path)}: "
            f"{node[leaf].shape} vs {value.shape}")
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)


def _convbn(params, stats, prefix_t, path_f, sd):
    """Map a torch Conv2d_BN pair onto ConvBN."""
    w = _t(sd[prefix_t + ".c.weight"])
    if w.shape[1] == 1 and w.shape[0] > 1:  # depthwise
        _set(params, path_f + ("c", "kernel"), w.transpose(2, 3, 1, 0))
    else:
        _set(params, path_f + ("c", "kernel"), _conv(w))
    _set(params, path_f + ("bn", "scale"), _t(sd[prefix_t + ".bn.weight"]))
    _set(params, path_f + ("bn", "bias"), _t(sd[prefix_t + ".bn.bias"]))
    _set(stats, path_f + ("bn", "mean"), _t(sd[prefix_t + ".bn.running_mean"]))
    _set(stats, path_f + ("bn", "var"), _t(sd[prefix_t + ".bn.running_var"]))


def _ln(params, prefix_t, path_f, sd, w="weight", b="bias"):
    _set(params, path_f + ("scale",), _t(sd[prefix_t + f".{w}"]))
    _set(params, path_f + ("bias",), _t(sd[prefix_t + f".{b}"]))


def _ln2d(params, prefix_t, path_f, sd):
    _set(params, path_f + ("weight",), _t(sd[prefix_t + ".weight"]))
    _set(params, path_f + ("bias",), _t(sd[prefix_t + ".bias"]))


def _linear(params, prefix_t, path_f, sd, bias=True):
    _set(params, path_f + ("kernel",), _dense(sd[prefix_t + ".weight"]))
    if bias and prefix_t + ".bias" in sd:
        _set(params, path_f + ("bias",), _t(sd[prefix_t + ".bias"]))


def convert_tinyvit(sd: Dict[str, Any], params: Dict, stats: Dict,
                    prefix: str = "image_encoder.", fprefix: Tuple[str, ...] = ("image_encoder",),
                    depths=(2, 2, 6, 2)) -> None:
    """Map a torch TinyViT (tiny_vit_sam) state dict onto our TinyViT tree."""
    p = prefix
    _convbn(params, stats, p + "patch_embed.seq.0", fprefix + ("patch_embed_conv1",), sd)
    _convbn(params, stats, p + "patch_embed.seq.2", fprefix + ("patch_embed_conv2",), sd)

    # stage 0 MBConvs
    for i in range(depths[0]):
        base = f"{p}layers.0.blocks.{i}"
        fb = fprefix + (f"stage0_block{i}",)
        for conv in ("conv1", "conv2", "conv3"):
            _convbn(params, stats, f"{base}.{conv}", fb + (conv,), sd)
    for mi, tl in ((0, 0), (1, 1), (2, 2)):
        base = f"{p}layers.{tl}.downsample"
        fb = fprefix + (f"merge{mi}",)
        for conv in ("conv1", "conv2", "conv3"):
            _convbn(params, stats, f"{base}.{conv}", fb + (conv,), sd)

    for stage in (1, 2, 3):
        for i in range(depths[stage]):
            base = f"{p}layers.{stage}.blocks.{i}"
            fb = fprefix + (f"stage{stage}_block{i}",)
            _ln(params, f"{base}.attn.norm", fb + ("attn", "norm"), sd)
            _linear(params, f"{base}.attn.qkv", fb + ("attn", "qkv"), sd)
            _linear(params, f"{base}.attn.proj", fb + ("attn", "proj"), sd)
            _set(params, fb + ("attn", "attention_biases"),
                 _t(sd[f"{base}.attn.attention_biases"]))
            _convbn(params, stats, f"{base}.local_conv", fb + ("local_conv",), sd)
            _ln(params, f"{base}.mlp.norm", fb + ("mlp_norm",), sd)
            _linear(params, f"{base}.mlp.fc1", fb + ("mlp", "lin1"), sd)
            _linear(params, f"{base}.mlp.fc2", fb + ("mlp", "lin2"), sd)

    _set(params, fprefix + ("neck_conv1", "kernel"), _conv(sd[p + "neck.0.weight"]))
    _ln2d(params, p + "neck.1", fprefix + ("neck_ln1",), sd)
    _set(params, fprefix + ("neck_conv2", "kernel"), _conv(sd[p + "neck.2.weight"]))
    _ln2d(params, p + "neck.3", fprefix + ("neck_ln2",), sd)


def convert_vitdet(sd: Dict[str, Any], params: Dict,
                   prefix: str = "image_encoder.",
                   fprefix: Tuple[str, ...] = ("image_encoder",),
                   depth: int = 12) -> None:
    """Map a torch ViT-Det SAM encoder (reference image_encoder.py) onto
    our ImageEncoderViT tree (vit_b/l/h)."""
    p = prefix
    _set(params, fprefix + ("patch_embed", "kernel"),
         _conv(sd[p + "patch_embed.proj.weight"]))
    _set(params, fprefix + ("patch_embed", "bias"),
         _t(sd[p + "patch_embed.proj.bias"]))
    if p + "pos_embed" in sd:
        _set(params, fprefix + ("pos_embed",), _t(sd[p + "pos_embed"]))
    for i in range(depth):
        base = f"{p}blocks.{i}"
        fb = fprefix + (f"block{i}",)
        _ln(params, f"{base}.norm1", fb + ("norm1",), sd)
        _ln(params, f"{base}.norm2", fb + ("norm2",), sd)
        _linear(params, f"{base}.attn.qkv", fb + ("attn", "qkv"), sd)
        _linear(params, f"{base}.attn.proj", fb + ("attn", "proj"), sd)
        if f"{base}.attn.rel_pos_h" in sd:
            _set(params, fb + ("attn", "rel_pos_h"),
                 _t(sd[f"{base}.attn.rel_pos_h"]))
            _set(params, fb + ("attn", "rel_pos_w"),
                 _t(sd[f"{base}.attn.rel_pos_w"]))
        _linear(params, f"{base}.mlp.lin1", fb + ("mlp", "lin1"), sd)
        _linear(params, f"{base}.mlp.lin2", fb + ("mlp", "lin2"), sd)
    _set(params, fprefix + ("neck_conv1", "kernel"), _conv(sd[p + "neck.0.weight"]))
    _ln2d(params, p + "neck.1", fprefix + ("neck_ln1",), sd)
    _set(params, fprefix + ("neck_conv2", "kernel"), _conv(sd[p + "neck.2.weight"]))
    _ln2d(params, p + "neck.3", fprefix + ("neck_ln2",), sd)


def convert_prompt_encoder(sd, params, prefix="prompt_encoder.",
                           fprefix=("prompt_encoder",)):
    _set(params, fprefix + ("pe_layer", "positional_encoding_gaussian_matrix"),
         _t(sd[prefix + "pe_layer.positional_encoding_gaussian_matrix"]))
    for i in range(4):
        _set(params, fprefix + (f"point_embed_{i}",),
             _t(sd[prefix + f"point_embeddings.{i}.weight"]))
    _set(params, fprefix + ("not_a_point_embed",),
         _t(sd[prefix + "not_a_point_embed.weight"]))
    _set(params, fprefix + ("no_mask_embed",),
         _t(sd[prefix + "no_mask_embed.weight"]))
    _set(params, fprefix + ("mask_conv1", "kernel"),
         _conv(sd[prefix + "mask_downscaling.0.weight"]))
    _set(params, fprefix + ("mask_conv1", "bias"),
         _t(sd[prefix + "mask_downscaling.0.bias"]))
    _ln2d(params, prefix + "mask_downscaling.1", fprefix + ("mask_ln1",), sd)
    _set(params, fprefix + ("mask_conv2", "kernel"),
         _conv(sd[prefix + "mask_downscaling.3.weight"]))
    _set(params, fprefix + ("mask_conv2", "bias"),
         _t(sd[prefix + "mask_downscaling.3.bias"]))
    _ln2d(params, prefix + "mask_downscaling.4", fprefix + ("mask_ln2",), sd)
    _set(params, fprefix + ("mask_conv3", "kernel"),
         _conv(sd[prefix + "mask_downscaling.6.weight"]))
    _set(params, fprefix + ("mask_conv3", "bias"),
         _t(sd[prefix + "mask_downscaling.6.bias"]))


def convert_prompt_autoencoder(sd, params, prefix="prompt_autoencoder.",
                               fprefix=("prompt_autoencoder",)):
    """torch PromptAutoEncoder (reference prompt_encoder.py:50-100,
    unused by any pipeline) -> Flax PromptAutoEncoder: the
    image_downscaling Sequential's conv/LN indices 0/1/3/4/6."""
    for t_idx, f_name in ((0, "down_conv1"), (3, "down_conv2"),
                          (6, "down_conv3")):
        _set(params, fprefix + (f_name, "kernel"),
             _conv(sd[f"{prefix}image_downscaling.{t_idx}.weight"]))
        _set(params, fprefix + (f_name, "bias"),
             _t(sd[f"{prefix}image_downscaling.{t_idx}.bias"]))
    _ln2d(params, prefix + "image_downscaling.1", fprefix + ("down_ln1",), sd)
    _ln2d(params, prefix + "image_downscaling.4", fprefix + ("down_ln2",), sd)


def _attention(sd, params, tbase, fbase):
    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        _linear(params, f"{tbase}.{proj}", fbase + (proj,), sd)


def convert_mask_decoder(sd, params, num_mask_tokens: int,
                         prefix="mask_decoder.", fprefix=("mask_decoder",)):
    _set(params, fprefix + ("iou_token",), _t(sd[prefix + "iou_token.weight"]))
    _set(params, fprefix + ("mask_tokens",), _t(sd[prefix + "mask_tokens.weight"]))

    tf = prefix + "transformer."
    ff = fprefix + ("transformer",)
    for i in range(2):
        tb = f"{tf}layers.{i}"
        fb = ff + (f"layer{i}",)
        _attention(sd, params, f"{tb}.self_attn", fb + ("self_attn",))
        _attention(sd, params, f"{tb}.cross_attn_token_to_image",
                   fb + ("cross_attn_token_to_image",))
        _attention(sd, params, f"{tb}.cross_attn_image_to_token",
                   fb + ("cross_attn_image_to_token",))
        for n in range(1, 5):
            _ln(params, f"{tb}.norm{n}", fb + (f"norm{n}",), sd)
        _linear(params, f"{tb}.mlp.lin1", fb + ("mlp", "lin1"), sd)
        _linear(params, f"{tb}.mlp.lin2", fb + ("mlp", "lin2"), sd)
    _attention(sd, params, f"{tf}final_attn_token_to_image",
               ff + ("final_attn_token_to_image",))
    _ln(params, f"{tf}norm_final_attn", ff + ("norm_final_attn",), sd)

    _set(params, fprefix + ("upscale_conv1", "kernel"),
         _convT(sd[prefix + "output_upscaling.0.weight"]))
    _set(params, fprefix + ("upscale_conv1", "bias"),
         _t(sd[prefix + "output_upscaling.0.bias"]))
    _ln2d(params, prefix + "output_upscaling.1", fprefix + ("upscale_ln",), sd)
    _set(params, fprefix + ("upscale_conv2", "kernel"),
         _convT(sd[prefix + "output_upscaling.3.weight"]))
    _set(params, fprefix + ("upscale_conv2", "bias"),
         _t(sd[prefix + "output_upscaling.3.bias"]))

    for i in range(num_mask_tokens):
        for j in range(3):
            _linear(params, f"{prefix}output_hypernetworks_mlps.{i}.layers.{j}",
                    fprefix + (f"hypernet_{i}", f"layer{j}"), sd)
    for j in range(3):
        _linear(params, f"{prefix}iou_prediction_head.layers.{j}",
                fprefix + ("iou_prediction_head", f"layer{j}"), sd)


def convert_sam_state_dict(sd: Dict[str, Any], variables: Dict,
                           arch: str = "vit_t",
                           num_classes: int = 3) -> Dict:
    """Full Sam state dict -> variables pytree (copies; input untouched)."""
    import jax

    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))

    if arch == "vit_t":
        convert_tinyvit(sd, params, stats)
    elif arch in ("vit_b", "vit_l", "vit_h"):
        depth = {"vit_b": 12, "vit_l": 24, "vit_h": 32}[arch]
        convert_vitdet(sd, params, depth=depth)
    else:
        raise CheckpointError(f"Converter for arch {arch!r} not implemented yet")
    convert_prompt_encoder(sd, params)
    convert_mask_decoder(sd, params, num_mask_tokens=num_classes + 1)

    out = dict(variables)
    out["params"] = params
    if stats:
        out["batch_stats"] = stats
    return out


def load_torch_checkpoint(path: str, variables: Dict, arch: str = "vit_t",
                          num_classes: int = 3) -> Dict:
    """Load a .pth state dict (the fine-tuned checkpoint_best.pth of the
    reference, or the public mobile_sam.pt) and convert."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return convert_sam_state_dict(sd, variables, arch=arch,
                                  num_classes=num_classes)
