"""Parameter sharding policy for the SAM zoo over a ('data','model') mesh.

The reference's only model parallelism is a manual 2-GPU block placement
(image_encoder.py:99-104); the TPU-native generalization is weight
sharding: MLP and attention projection matrices split over the 'model'
axis (Megatron-style column/row parallel pairs), everything else
replicated. XLA inserts the psum over 'model' where the row-parallel
matmul needs it.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sam_param_shardings(mesh: Mesh, params: Dict) -> Dict:
    """NamedSharding pytree matching ``params``: column-parallel first
    projections (mlp lin1, fused qkv), row-parallel second projections
    (mlp lin2, attention out proj); biases and norms replicated."""
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        joined = "/".join(str(p) for p in path)
        spec = P()
        if joined.endswith("kernel") and leaf.ndim == 2:
            dim_in, dim_out = leaf.shape
            nmodel = mesh.shape["model"]
            if ("mlp/lin1/" in joined or "/qkv/" in joined) and dim_out % nmodel == 0:
                spec = P(None, "model")          # column parallel
            elif ("mlp/lin2/" in joined or "/proj/" in joined
                  or "out_proj" in joined) and dim_in % nmodel == 0:
                spec = P("model", None)          # row parallel
        out[path] = NamedSharding(mesh, spec)
    return traverse_util.unflatten_dict(out)


def apply_shardings(tree: Any, shardings: Any) -> Any:
    return jax.tree.map(jax.device_put, tree, shardings)
