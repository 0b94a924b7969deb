"""Weight-only int8 quantization for SAM inference.

The reference has no quantized path (its SAM inference runs fp32 torch
CUDA, calculate_optical_flow.py:60-85); this is a TPU-serving knob: the
vit_t encoder at 1024^2 is bound by HBM traffic and weight-prefetch
copies rather than one dominant op (see NOTES.md encoder profile), so
storing matmul/conv kernels as int8 halves their HBM footprint and
stream cost while compute stays bf16 (the dequantize convert fuses into
each consumer under XLA).

Scheme: symmetric per-output-channel int8 on every ``kernel`` leaf with
ndim >= 2 (Flax Dense / Conv / attention projections). Biases, norm
scales, positional/attention-bias tables stay in their original dtype —
they are added, not multiplied, so absolute quantization error there
would leak straight into activations.

The quantized tree is a drop-in for ``make_clip_segmentor(...,
weights_int8=True)``: the segmentor dequantizes *inside* its jitted
program, so the int8 leaves are what lives in HBM and crosses the
host->device link.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
import numpy as np


class QuantizedArray(NamedTuple):
    """int8 values + per-output-channel (last axis) float32 scales.

    A NamedTuple so the whole variables pytree stays a valid JAX pytree
    (device_put / jit / sharding all map over the leaves untouched).
    """

    q: Any  # int8, original kernel shape
    scale: Any  # float32, shape (1, ..., 1, out_channels)


def _quantize_leaf(x) -> QuantizedArray:
    x32 = np.asarray(x, np.float32)
    reduce_axes = tuple(range(x32.ndim - 1))
    amax = np.max(np.abs(x32), axis=reduce_axes, keepdims=True)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(x32 / scale), -127, 127).astype(np.int8)
    return QuantizedArray(q=q, scale=scale)


def _is_quantizable(name: str, value) -> bool:
    # dtype is read host-side (np, not jnp.asarray) — device_putting every
    # kernel just to inspect its dtype would upload the full weight set
    dtype = getattr(value, "dtype", None)
    if dtype is None:
        dtype = np.asarray(value).dtype
    return (name == "kernel" and np.ndim(value) >= 2
            and np.issubdtype(dtype, np.floating))


def quantize_variables_int8(variables: Any) -> Any:
    """Return a copy of a Flax variables pytree with every quantizable
    kernel replaced by a :class:`QuantizedArray` (host numpy leaves —
    they upload on first jitted use, at half the bf16 byte count)."""

    def rec(node, name=""):
        if isinstance(node, dict):
            return {k: rec(v, k) for k, v in node.items()}
        if _is_quantizable(name, node):
            return _quantize_leaf(node)
        return node

    return rec(variables)


def dequantize_variables(variables: Any, dtype=jnp.bfloat16) -> Any:
    """Inverse of :func:`quantize_variables_int8`, for use INSIDE a jitted
    function: each int8 leaf converts+scales to ``dtype``; XLA fuses the
    convert into the consuming dot/conv so the bf16 copy never round-trips
    HBM."""

    def rec(node):
        if isinstance(node, QuantizedArray):
            # multiply by the f32 scale BEFORE the dtype cast: scaling in
            # bf16 would add a second rounding (up to ~0.4% on the scale)
            # on top of the int8 rounding; XLA still fuses the chain
            return (node.q.astype(jnp.float32) * node.scale).astype(dtype)
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(variables)


def quantization_error(variables: Any) -> float:
    """Max relative (per-channel-amax-normalized) round-trip error over
    all quantized kernels — a diagnostic; symmetric int8 bounds it by
    0.5/127 ~= 0.004."""
    err = 0.0

    def rec(node, name=""):
        nonlocal err
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, k)
        elif _is_quantizable(name, node):
            qa = _quantize_leaf(node)
            deq = qa.q.astype(np.float32) * qa.scale
            amax = np.maximum(np.max(np.abs(np.asarray(node, np.float32))),
                              1e-12)
            err = max(err, float(np.max(np.abs(deq - np.asarray(node)))
                                 / amax))

    rec(variables)
    return err
