"""SAM model registry + builders.

Parity with reference finetune-SAM/models/sam/build_sam.py:115-121
({default, vit_h, vit_l, vit_b, vit_t}) and its hyperparameters: vit_t =
TinyViT embed_dims [64,128,160,320] / depths [2,2,6,2] / heads [2,4,5,10]
/ windows [7,7,14,7] (:66-78); ViT-Det encoder dims/depths/global-attn
indexes for b/l/h (:21-57, :140-154). ``num_classes`` maps to the
decoder's num_multimask_outputs exactly as the reference wires it
(:85-97).

Builders return (model, variables): an un-initialized Flax module plus a
freshly initialized (or checkpoint-loaded) variable pytree.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .image_encoder import ImageEncoderViT
from .sam import Sam
from .tinyvit import TinyViT


def _init_variables(model: Sam, image_size: int, seed: int = 0):
    rng = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    # init on host CPU: flax init traces a full forward, and compiling
    # that at 1024^2 on the accelerator is a multi-minute cold-start for
    # weights that a checkpoint load typically overwrites anyway. The
    # weights move to the accelerator on first jitted use.
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None and jax.default_backend() not in ("cpu",):
        with jax.default_device(cpu):
            return model.init(rng, dummy)
    return model.init(rng, dummy)


def build_sam_vit_t(num_classes: int = 3, image_size: int = 1024,
                    checkpoint: Optional[str] = None,
                    adapter_stages: Sequence[int] = (),
                    use_decoder_adapter: bool = False,
                    dtype=jnp.float32, seed: int = 0) -> Tuple[Sam, dict]:
    encoder = TinyViT(img_size=image_size, adapter_stages=tuple(adapter_stages),
                      dtype=dtype)
    model = Sam(image_encoder=encoder, num_classes=num_classes,
                image_size=image_size,
                use_decoder_adapter=use_decoder_adapter, dtype=dtype)
    variables = _init_variables(model, image_size, seed)
    if checkpoint:
        from .convert import load_torch_checkpoint
        variables = load_torch_checkpoint(checkpoint, variables, arch="vit_t")
    return model, variables


def _build_vitdet(embed_dim, depth, num_heads, global_attn, num_classes,
                  image_size, checkpoint, adapter_blocks, use_decoder_adapter,
                  dtype, seed, arch):
    encoder = ImageEncoderViT(
        img_size=image_size, embed_dim=embed_dim, depth=depth,
        num_heads=num_heads, global_attn_indexes=tuple(global_attn),
        adapter_blocks=tuple(adapter_blocks), dtype=dtype)
    model = Sam(image_encoder=encoder, num_classes=num_classes,
                image_size=image_size,
                use_decoder_adapter=use_decoder_adapter, dtype=dtype)
    variables = _init_variables(model, image_size, seed)
    if checkpoint:
        from .convert import load_torch_checkpoint
        variables = load_torch_checkpoint(checkpoint, variables, arch=arch)
    return model, variables


def build_sam_vit_b(num_classes: int = 3, image_size: int = 1024,
                    checkpoint: Optional[str] = None,
                    adapter_blocks: Sequence[int] = (),
                    use_decoder_adapter: bool = False,
                    dtype=jnp.float32, seed: int = 0):
    return _build_vitdet(768, 12, 12, (2, 5, 8, 11), num_classes, image_size,
                         checkpoint, adapter_blocks, use_decoder_adapter,
                         dtype, seed, "vit_b")


def build_sam_vit_l(num_classes: int = 3, image_size: int = 1024,
                    checkpoint: Optional[str] = None,
                    adapter_blocks: Sequence[int] = (),
                    use_decoder_adapter: bool = False,
                    dtype=jnp.float32, seed: int = 0):
    return _build_vitdet(1024, 24, 16, (5, 11, 17, 23), num_classes, image_size,
                         checkpoint, adapter_blocks, use_decoder_adapter,
                         dtype, seed, "vit_l")


def build_sam_vit_h(num_classes: int = 3, image_size: int = 1024,
                    checkpoint: Optional[str] = None,
                    adapter_blocks: Sequence[int] = (),
                    use_decoder_adapter: bool = False,
                    dtype=jnp.float32, seed: int = 0):
    return _build_vitdet(1280, 32, 16, (7, 15, 23, 31), num_classes, image_size,
                         checkpoint, adapter_blocks, use_decoder_adapter,
                         dtype, seed, "vit_h")


sam_model_registry = {
    "default": build_sam_vit_h,
    "vit_h": build_sam_vit_h,
    "vit_l": build_sam_vit_l,
    "vit_b": build_sam_vit_b,
    "vit_t": build_sam_vit_t,
}
