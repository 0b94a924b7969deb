"""Model export for serving.

The reference ships an ONNX-exportable decoder wrapper
(finetune-SAM/models/sam/utils/onnx.py SamOnnxModel). The JAX-native
equivalent is ``jax.export``: serialize the jitted forward to a portable
StableHLO artifact that any XLA runtime (TPU serving, CPU, GPU) can load
without Python.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def export_forward(model, variables, image_size: Optional[int] = None,
                   batch: int = 1) -> bytes:
    """Serialize the no-prompt multimask forward to StableHLO bytes."""
    from jax import export as jax_export

    size = image_size or model.image_size

    def forward(images):
        logits, iou = model.apply(variables, images, multimask_output=True)
        return jnp.argmax(logits, axis=1).astype(jnp.uint8), iou

    exported = jax_export.export(jax.jit(forward))(
        jax.ShapeDtypeStruct((batch, size, size, 3), jnp.float32))
    return exported.serialize()


def save_exported(model, variables, path: str, **kw) -> str:
    data = export_forward(model, variables, **kw)
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_exported(path: str):
    """Deserialize and return a callable running the exported graph."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call
