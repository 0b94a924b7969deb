"""LoRA for the Flax SAM zoo, as a parameter-space transformation.

The reference performs module surgery on torch Linears (sam_LoRa.py:17-65
wraps the fused qkv so q and v get low-rank deltas; :165-236 does the same
to the decoder's self/cross/final attentions; A is kaiming-init, B zero,
:241-263). In a functional JAX stack the idiomatic equivalent is a
*parameter transformation*: LoRA factors live in their own pytree and are
merged into the (stop-gradient'd) base weights on the fly inside the
train step — so optax sees only the LoRA leaves as trainable, the merged
weights feed the unchanged model, and XLA fuses the rank-r update into
the matmul's producer.

Fused-qkv handling: TinyViT's qkv output is laid out per head as
[k_q | k_k | k_v] x num_heads, so the q/v columns are strided; the merge
scatters the low-rank delta into exactly those columns.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def qkv_qv_columns(dim: int, num_heads: int) -> Tuple[np.ndarray, np.ndarray]:
    """Column indices of q and v inside TinyViT's fused qkv output
    (per head: key_dim q, key_dim k, key_dim v with attn_ratio=1)."""
    kd = dim // num_heads
    per = 3 * kd
    q_cols, v_cols = [], []
    for h in range(num_heads):
        base = h * per
        q_cols.extend(range(base, base + kd))
        v_cols.extend(range(base + 2 * kd, base + 3 * kd))
    return np.asarray(q_cols), np.asarray(v_cols)


def _kaiming(key, shape):
    fan_in = shape[0]
    bound = float(np.sqrt(6.0 / fan_in))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _iter_attn_sites(params: Dict) -> List[Tuple[Tuple[str, ...], str]]:
    """Yield (path, kind) for every LoRA-able attention projection:
    kind 'fused_qkv' for TinyViT attn.qkv, 'dense' for decoder q/v projs."""
    sites = []

    def walk(node, path):
        if not isinstance(node, dict):
            return
        for k, v in node.items():
            p = path + (k,)
            if k == "attn" and isinstance(v, dict) and "qkv" in v:
                sites.append((p + ("qkv",), "fused_qkv"))
            elif k in ("self_attn", "cross_attn_token_to_image",
                       "cross_attn_image_to_token", "final_attn_token_to_image"):
                sites.append((p + ("q_proj",), "dense"))
                sites.append((p + ("v_proj",), "dense"))
            else:
                walk(v, p)

    walk(params, ())
    return sites


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def init_lora(params: Dict, rank: int = 4, seed: int = 0,
              encoder: bool = True, decoder: bool = True,
              encoder_layers: Optional[List[int]] = None) -> Dict:
    """Create the LoRA factor pytree {site_key: {'a': ..., 'b': ...}}.

    For fused qkv sites two factor pairs are created (q and v). B is
    zero-initialized so the merged model starts identical to the base.

    ``encoder_layers`` restricts the encoder surgery to the given flat
    attention-block indices (the reference's ``encoder_lora_layer`` list,
    cfg.py:67, which indexes the encoder's blocks in order; an empty or
    None list means every block — the reference's documented "[] adds at
    each layer" semantics). Encoder sites are indexed in parameter-tree
    walk order, which is module creation order (stage by stage, block by
    block) — the same flat order the reference enumerates.
    """
    key = jax.random.PRNGKey(seed)
    lora: Dict[str, Dict[str, jnp.ndarray]] = {}
    wanted = set(encoder_layers or [])
    enc_idx = -1
    for path, kind in _iter_attn_sites(params):
        in_enc = path[0] == "image_encoder"
        if in_enc:
            enc_idx += 1
        if in_enc and not encoder:
            continue
        if not in_enc and not decoder:
            continue
        if in_enc and wanted and enc_idx not in wanted:
            continue
        kernel = _get(params, path)["kernel"]
        fan_in = kernel.shape[0]
        name = "/".join(path)
        if kind == "fused_qkv":
            # infer heads from the fused width: width = 3 * dim, dim == fan_in
            total = kernel.shape[1]
            assert total == 3 * fan_in, "unexpected fused qkv layout"
            key, k1, k2 = jax.random.split(key, 3)
            ncols = total // 3
            lora[name] = {
                "a_q": _kaiming(k1, (fan_in, rank)),
                "b_q": jnp.zeros((rank, ncols), jnp.float32),
                "a_v": _kaiming(k2, (fan_in, rank)),
                "b_v": jnp.zeros((rank, ncols), jnp.float32),
            }
        else:
            key, k1 = jax.random.split(key)
            lora[name] = {
                "a": _kaiming(k1, (fan_in, rank)),
                "b": jnp.zeros((rank, kernel.shape[1]), jnp.float32),
            }
    return lora


def merge_lora(params: Dict, lora: Dict,
               heads_by_dim: Optional[Dict[int, int]] = None) -> Dict:
    """Return params with LoRA deltas merged into the projection kernels.
    Base params flow through stop_gradient so only LoRA leaves train."""
    heads_by_dim = heads_by_dim or {128: 4, 160: 5, 320: 10}
    flat = dict(lora)
    merged = jax.tree.map(lambda x: x, params)  # shallow-copied dicts below

    def rebuild(node, path):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            p = path + (k,)
            name = "/".join(p)
            if name in flat and isinstance(v, dict) and "kernel" in v:
                kernel = jax.lax.stop_gradient(v["kernel"])
                fac = flat[name]
                if "a_q" in fac:
                    dim = kernel.shape[0]
                    heads = heads_by_dim.get(dim)
                    if heads is None:
                        raise ValueError(f"no head count known for dim {dim}")
                    q_cols, v_cols = qkv_qv_columns(dim, heads)
                    dq = fac["a_q"] @ fac["b_q"]
                    dv = fac["a_v"] @ fac["b_v"]
                    kernel = kernel.at[:, jnp.asarray(q_cols)].add(dq)
                    kernel = kernel.at[:, jnp.asarray(v_cols)].add(dv)
                else:
                    kernel = kernel + fac["a"] @ fac["b"]
                nv = dict(v)
                nv["kernel"] = kernel
                if "bias" in nv:
                    nv["bias"] = jax.lax.stop_gradient(nv["bias"])
                out[k] = nv
            else:
                out[k] = rebuild(v, p)
        return out

    return rebuild(merged, ())
