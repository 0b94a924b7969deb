"""Numerical parity of the torch->flax checkpoint converter.

Strategy (no real checkpoints exist in this mount — the fine-tuned .pth is
stripped): instantiate the *reference torch modules* with random weights,
convert their state dicts with models/convert.py, and compare outputs of
the flax modules against torch on the same inputs. Component-level tests
keep CPU cost tractable; the full-Sam conversion is checked structurally
(every path maps, no shape mismatches).

The reference imports timm only for DropPath/register_model; a minimal
shim stands in (drop_path_rate is 0 everywhere in the pipeline).
"""

import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# ---- timm shim (reference tiny_vit_sam imports DropPath/register_model) ----
if "timm" not in sys.modules:
    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_registry = types.ModuleType("timm.models.registry")

    class _DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    timm_layers.DropPath = _DropPath
    timm_layers.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
    timm_layers.trunc_normal_ = lambda t, std=0.02: torch.nn.init.trunc_normal_(t, std=std)
    timm_registry.register_model = lambda fn=None, **kw: (fn if fn else (lambda f: f))
    timm.models = timm_models
    timm_models.layers = timm_layers
    timm_models.registry = timm_registry
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers
    sys.modules["timm.models.registry"] = timm_registry

if "torchvision" not in sys.modules:
    # the reference's unused vit.py imports to_pil_image at module scope
    tv = types.ModuleType("torchvision")
    tv.__path__ = []  # mark as package so submodule imports resolve
    tv_tr = types.ModuleType("torchvision.transforms")
    tv_tr.__path__ = []
    tv_fn = types.ModuleType("torchvision.transforms.functional")
    tv_fn.to_pil_image = lambda *a, **kw: None
    tv_fn.resize = lambda *a, **kw: None
    tv_ut = types.ModuleType("torchvision.utils")
    tv_ut.make_grid = lambda *a, **kw: None
    tv_ds = types.ModuleType("torchvision.datasets")
    tv_ds.ImageFolder = object
    tv_ops = types.ModuleType("torchvision.ops")
    tv_ops.__path__ = []
    tv_boxes = types.ModuleType("torchvision.ops.boxes")
    tv_boxes.batched_nms = lambda *a, **kw: None
    tv_boxes.box_area = lambda *a, **kw: None
    tv_ops.boxes = tv_boxes
    tv.transforms = tv_tr
    tv.utils = tv_ut
    tv.datasets = tv_ds
    tv_tr.functional = tv_fn
    tv_tr.Compose = object
    tv_tr.Resize = object
    tv_tr.ToTensor = object
    tv_tr.Normalize = object
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv_tr
    sys.modules["torchvision.transforms.functional"] = tv_fn
    sys.modules["torchvision.utils"] = tv_ut
    sys.modules["torchvision.datasets"] = tv_ds
    sys.modules["torchvision.ops"] = tv_ops
    sys.modules["torchvision.ops.boxes"] = tv_boxes

sys.path.insert(0, "/root/reference/finetune-SAM")

REF_ARGS = SimpleNamespace(
    image_size=1024, if_encoder_adapter=False, encoder_adapter_depths=[],
    thd=False, encoder_depth_layer=[], depth=1, if_mask_decoder_adapter=False,
    decoder_adapt_depth=1,
)


def _torch_seed():
    torch.manual_seed(0)
    np.random.seed(0)


def test_tinyvit_block_parity():
    """One windowed-attention block, torch vs flax, converted weights."""
    import jax.numpy as jnp
    from models.sam.modeling.tiny_vit_sam import TinyViTBlock as TorchBlock

    from tee_optical_flow_tpu.models.convert import (
        _convbn, _linear, _ln, _set, _t)
    from tee_optical_flow_tpu.models.tinyvit import TinyViTBlock

    _torch_seed()
    dim, heads, ws, res = 128, 4, 7, (14, 14)
    tb = TorchBlock(REF_ARGS, dim=dim, input_resolution=res, num_heads=heads,
                    window_size=ws, mlp_ratio=4.0)
    tb.eval()
    sd = tb.state_dict()

    fb = TinyViTBlock(dim, heads, ws)
    import jax
    x = np.random.default_rng(0).normal(size=(2, res[0], res[1], dim)).astype(np.float32)
    variables = fb.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    _ln(params, "attn.norm", ("attn", "norm"), sd)
    _linear(params, "attn.qkv", ("attn", "qkv"), sd)
    _linear(params, "attn.proj", ("attn", "proj"), sd)
    _set(params, ("attn", "attention_biases"), _t(sd["attn.attention_biases"]))
    _convbn(params, stats, "local_conv", ("local_conv",), sd)
    _ln(params, "mlp.norm", ("mlp_norm",), sd)
    _linear(params, "mlp.fc1", ("mlp", "lin1"), sd)
    _linear(params, "mlp.fc2", ("mlp", "lin2"), sd)

    ours = np.asarray(fb.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(x)))
    with torch.no_grad():
        xt = torch.from_numpy(x.reshape(2, res[0] * res[1], dim))
        theirs = tb(xt).detach().numpy().reshape(2, res[0], res[1], dim)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


@pytest.mark.slow
def test_prompt_and_decoder_parity():
    """No-prompt PromptEncoder + MaskDecoder at an 8x8 grid. (Slow tier
    with the other whole-module parity runs; the fast tier keeps the
    per-block TinyViT/ViT-Det numeric parity tests.)"""
    import jax
    import jax.numpy as jnp
    from models.sam.modeling.prompt_encoder import PromptEncoder as TorchPE
    from models.sam.modeling.mask_decoder import MaskDecoder as TorchMD
    from models.sam.modeling.transformer import TwoWayTransformer as TorchTT

    from tee_optical_flow_tpu.models.convert import (
        convert_mask_decoder, convert_prompt_encoder)
    from tee_optical_flow_tpu.models.mask_decoder import MaskDecoder
    from tee_optical_flow_tpu.models.prompt_encoder import PromptEncoder

    _torch_seed()
    grid, img = 8, 128
    num_classes = 3
    tpe = TorchPE(embed_dim=256, image_embedding_size=(grid, grid),
                  input_image_size=(img, img), mask_in_chans=16)
    tmd = TorchMD(num_multimask_outputs=num_classes,
                  transformer=TorchTT(args=REF_ARGS, depth=2,
                                      embedding_dim=256, mlp_dim=2048,
                                      num_heads=8),
                  transformer_dim=256, iou_head_depth=3,
                  iou_head_hidden_dim=256)
    tpe.eval()
    tmd.eval()

    fpe = PromptEncoder(embed_dim=256, image_embedding_size=(grid, grid),
                        input_image_size=(img, img))
    fmd = MaskDecoder(transformer_dim=256, num_multimask_outputs=num_classes)

    rng = np.random.default_rng(1)
    emb = rng.normal(size=(2, grid, grid, 256)).astype(np.float32)

    pe_vars = fpe.init(jax.random.PRNGKey(0), batch_size=2)
    pe_params = jax.tree.map(np.asarray, pe_vars["params"])
    convert_prompt_encoder(tpe.state_dict(), pe_params, prefix="", fprefix=())

    sparse_f, dense_f = fpe.apply({"params": pe_params}, batch_size=2)
    image_pe_f = fpe.apply({"params": pe_params}, method=fpe.get_dense_pe)

    with torch.no_grad():
        sparse_t, dense_t = tpe(points=None, boxes=None, masks=None)
        image_pe_t = tpe.get_dense_pe()  # (1, C, h, w)
    np.testing.assert_allclose(
        np.asarray(dense_f)[0].transpose(2, 0, 1), dense_t[0].detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(image_pe_f).transpose(2, 0, 1), image_pe_t[0].detach().numpy(), atol=1e-5)

    md_vars = fmd.init(jax.random.PRNGKey(0), jnp.asarray(emb),
                       jnp.asarray(np.asarray(image_pe_f)),
                       jnp.zeros((2, 0, 256)), jnp.asarray(np.asarray(dense_f))[:2])
    md_params = jax.tree.map(np.asarray, md_vars["params"])
    convert_mask_decoder(tmd.state_dict(), md_params,
                         num_mask_tokens=num_classes + 1, prefix="", fprefix=())

    dense2 = jnp.broadcast_to(jnp.asarray(np.asarray(dense_f))[:1], emb.shape)
    masks_f, iou_f = fmd.apply({"params": md_params}, jnp.asarray(emb),
                               jnp.asarray(np.asarray(image_pe_f)),
                               jnp.zeros((2, 0, 256)), dense2,
                               multimask_output=True)
    with torch.no_grad():
        src_t = torch.from_numpy(emb.transpose(0, 3, 1, 2))
        masks_t, iou_t = tmd(
            image_embeddings=src_t,
            image_pe=image_pe_t,
            sparse_prompt_embeddings=torch.zeros(2, 0, 256),
            dense_prompt_embeddings=torch.from_numpy(
                np.asarray(dense_f)[:1].transpose(0, 3, 1, 2)).expand(2, -1, grid, grid),
            multimask_output=True)
    np.testing.assert_allclose(np.asarray(masks_f), masks_t.detach().numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(iou_f), iou_t.detach().numpy(), atol=5e-4)


def test_prompt_autoencoder_parity():
    """PromptAutoEncoder (reference prompt_encoder.py:50-100 — unused by
    any pipeline, but API surface in the zoo; VERDICT r4 #9): torch
    random-init -> convert -> numeric parity of the dense embedding,
    including the module's valid-padding quirks (66^2 in -> 16^2 out)."""
    import jax
    import jax.numpy as jnp
    from models.sam.modeling.prompt_encoder import (
        PromptAutoEncoder as TorchPAE,
    )

    from tee_optical_flow_tpu.models.convert import convert_prompt_autoencoder
    from tee_optical_flow_tpu.models.prompt_encoder import PromptAutoEncoder

    _torch_seed()
    tpae = TorchPAE(image_embedding_size=(16, 16), input_image_size=(66, 66),
                    mask_in_chans=16, embed_dim=32)
    tpae.eval()
    fpae = PromptAutoEncoder(image_embedding_size=(16, 16),
                             input_image_size=(66, 66), mask_in_chans=16,
                             embed_dim=32)

    rng = np.random.default_rng(3)
    img = rng.normal(size=(2, 66, 66, 3)).astype(np.float32)
    variables = fpae.init(jax.random.PRNGKey(0), jnp.asarray(img))
    params = jax.tree.map(np.asarray, variables["params"])
    convert_prompt_autoencoder(tpae.state_dict(), params, prefix="",
                               fprefix=())

    sparse_f, dense_f = fpae.apply({"params": params}, jnp.asarray(img))
    with torch.no_grad():
        sparse_t, dense_t = tpae(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    assert sparse_f.shape == tuple(sparse_t.shape) == (2, 0, 32)
    np.testing.assert_allclose(
        np.asarray(dense_f).transpose(0, 3, 1, 2), dense_t.detach().numpy(),
        atol=2e-5)


@pytest.mark.slow
def test_full_sam_conversion_structural():
    """Every torch Sam vit_t tensor maps onto our tree without shape errors."""
    import jax
    from models.sam.build_sam import build_sam_vit_t

    from tee_optical_flow_tpu.models.convert import convert_sam_state_dict
    from tee_optical_flow_tpu.models.registry import build_sam_vit_t as build_ours

    _torch_seed()
    tsam = build_sam_vit_t(REF_ARGS, checkpoint=None, num_classes=3)
    sd = tsam.state_dict()

    # vit_t has NO image-size-dependent parameter shapes (TinyViT
    # attention biases key off window sizes; prompt/mask decoder are
    # fixed-width), so the template init can trace at 64^2 instead of
    # 1024^2 — identical tree, ~16x cheaper on the 1-core CI host. The
    # torch side stays at the reference's 1024 args.
    model, variables = build_ours(num_classes=3, image_size=64, seed=0)
    converted = convert_sam_state_dict(sd, variables, arch="vit_t", num_classes=3)

    # spot-check a few converted leaves against their torch sources
    p = converted["params"]
    np.testing.assert_allclose(
        p["image_encoder"]["neck_ln1"]["weight"],
        sd["image_encoder.neck.1.weight"].detach().numpy())
    np.testing.assert_allclose(
        p["mask_decoder"]["iou_token"], sd["mask_decoder.iou_token.weight"].detach().numpy())
    np.testing.assert_allclose(
        p["image_encoder"]["stage3_block1"]["attn"]["qkv"]["kernel"],
        sd["image_encoder.layers.3.blocks.1.attn.qkv.weight"].detach().numpy().T)


def test_vitdet_block_parity():
    """One ViT-Det block (windowed rel-pos attention), torch vs flax."""
    import jax
    import jax.numpy as jnp
    from models.sam.modeling.image_encoder import Block as TorchBlock

    from tee_optical_flow_tpu.models.convert import _linear, _ln, _set, _t
    from tee_optical_flow_tpu.models.image_encoder import Block

    _torch_seed()
    dim, heads, ws = 96, 4, 7
    args = SimpleNamespace(
        if_encoder_adapter=False, encoder_adapter_depths=[], thd=False,
        encoder_depth_layer=[], depth=1, image_size=1024)
    tb = TorchBlock(args, dim=dim, num_heads=heads, use_rel_pos=True,
                    window_size=ws, input_size=(14, 14))
    tb.eval()
    # give the zero-init rel-pos tables real values so the test is sharp
    with torch.no_grad():
        tb.attn.rel_pos_h.normal_(0, 0.05)
        tb.attn.rel_pos_w.normal_(0, 0.05)
    sd = tb.state_dict()

    fb = Block(dim, heads, window_size=ws, input_size=(14, 14))
    x = np.random.default_rng(0).normal(size=(2, 14, 14, dim)).astype(np.float32)
    variables = fb.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree.map(np.asarray, variables["params"])

    _ln(params, "norm1", ("norm1",), sd)
    _ln(params, "norm2", ("norm2",), sd)
    _linear(params, "attn.qkv", ("attn", "qkv"), sd)
    _linear(params, "attn.proj", ("attn", "proj"), sd)
    _set(params, ("attn", "rel_pos_h"), _t(sd["attn.rel_pos_h"]))
    _set(params, ("attn", "rel_pos_w"), _t(sd["attn.rel_pos_w"]))
    _linear(params, "mlp.lin1", ("mlp", "lin1"), sd)
    _linear(params, "mlp.lin2", ("mlp", "lin2"), sd)

    ours = np.asarray(fb.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tb(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-4)


@pytest.mark.slow
def test_vitdet_full_conversion_structural():
    """Every torch vit_b tensor maps onto our ImageEncoderViT tree."""
    import jax
    from models.sam.modeling.image_encoder import ImageEncoderViT as TorchEnc
    from functools import partial as _partial
    import torch.nn as tnn

    from tee_optical_flow_tpu.models.convert import convert_vitdet
    from tee_optical_flow_tpu.models.image_encoder import ImageEncoderViT

    _torch_seed()
    args = SimpleNamespace(
        if_encoder_adapter=False, encoder_adapter_depths=[], thd=False,
        encoder_depth_layer=[], depth=1, image_size=128,
        if_split_encoder_gpus=False, devices=["cpu", "cpu"],
        gpu_fractions=[0.5, 0.5], chunk=None)
    tenc = TorchEnc(args, img_size=128, embed_dim=96, depth=2, num_heads=4,
                    use_abs_pos=True, use_rel_pos=True, window_size=7,
                    global_attn_indexes=(1,),
                    norm_layer=_partial(tnn.LayerNorm, eps=1e-6))
    sd = {f"image_encoder.{k}": v for k, v in tenc.state_dict().items()}

    import jax.numpy as jnp
    fenc = ImageEncoderViT(img_size=128, embed_dim=96, depth=2, num_heads=4,
                           window_size=7, global_attn_indexes=(1,))
    variables = fenc.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 128, 128, 3)))
    params = jax.tree.map(np.asarray, variables["params"])
    convert_vitdet(sd, {"image_encoder": params}, depth=2)
    np.testing.assert_allclose(
        params["neck_ln1"]["weight"], sd["image_encoder.neck.1.weight"].numpy())


@pytest.mark.slow
def test_vitdet_thd_block_parity():
    """The 3D (thd) depth-attention branch, torch vs flax, on a config
    where the two documented divergences are moot: a GLOBAL-attention
    block (window_size=0 — the reference depth-attends the un-partitioned
    map there, as we always do) and chunk=6, where the reference's
    closest_numbers and our _closest_factors both give a (2, 3) depth
    grid. This pins the depth-attention wiring (shared attention weights
    on the depth grid, no-skip Depth Adapter, scatter-back) numerically;
    windowed thd blocks remain an intentional divergence (NOTES.md)."""
    import jax
    import jax.numpy as jnp
    from models.sam.modeling.image_encoder import Block as TorchBlock

    from tee_optical_flow_tpu.models.convert import _linear, _ln, _set, _t
    from tee_optical_flow_tpu.models.image_encoder import Block

    _torch_seed()
    dim, heads, d, hw = 64, 4, 6, 8
    args = SimpleNamespace(
        if_encoder_adapter=True, encoder_adapter_depths=[1], thd=True,
        encoder_depth_layer=[], depth=1, image_size=1024, chunk=d)
    tb = TorchBlock(args, dim=dim, num_heads=heads, use_rel_pos=True,
                    depth=1, window_size=0, input_size=(hw, hw))
    tb.eval()
    with torch.no_grad():
        tb.attn.rel_pos_h.normal_(0, 0.05)
        tb.attn.rel_pos_w.normal_(0, 0.05)
    sd = tb.state_dict()

    fb = Block(dim, heads, window_size=0, input_size=(hw, hw),
               use_adapter=True, thd=True, chunk=d)
    x = np.random.default_rng(0).normal(
        size=(2 * d, hw, hw, dim)).astype(np.float32)
    variables = fb.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree.map(np.asarray, variables["params"])

    _ln(params, "norm1", ("norm1",), sd)
    _ln(params, "norm2", ("norm2",), sd)
    _linear(params, "attn.qkv", ("attn", "qkv"), sd)
    _linear(params, "attn.proj", ("attn", "proj"), sd)
    _set(params, ("attn", "rel_pos_h"), _t(sd["attn.rel_pos_h"]))
    _set(params, ("attn", "rel_pos_w"), _t(sd["attn.rel_pos_w"]))
    _linear(params, "mlp.lin1", ("mlp", "lin1"), sd)
    _linear(params, "mlp.lin2", ("mlp", "lin2"), sd)
    for t_name, f_name in (("Space_Adapter", "space_adapter"),
                           ("MLP_Adapter", "mlp_adapter"),
                           ("Depth_Adapter", "depth_adapter")):
        _linear(params, f"{t_name}.D_fc1", (f_name, "down"), sd)
        _linear(params, f"{t_name}.D_fc2", (f_name, "up"), sd)

    ours = np.asarray(fb.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tb(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-4)
