"""End-to-end SAM module + batched clip inference.

Parity with reference finetune-SAM/models/sam/modeling/sam.py (Sam wrapper,
pixel statistics, pre/postprocess) and the pipeline's inference recipe
(evaluate_1_slice, calculate_optical_flow.py:47-88): resize frame to
1024x1024, ImageNet-normalize, encoder -> no-prompt prompt-encoder ->
multimask decoder -> argmax over classes -> NEAREST resize back.

TPU-first: ``segment_clip`` runs the whole clip through one jitted,
micro-batched program instead of the reference's per-frame Python loop
with host<->device round-trips per frame.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.imaging import IMAGENET_MEAN, IMAGENET_STD
from .mask_decoder import MaskDecoder
from .prompt_encoder import PromptEncoder


class Sam(nn.Module):
    """image_encoder + prompt_encoder + mask_decoder."""

    image_encoder: nn.Module
    num_classes: int = 3
    image_size: int = 1024
    embed_dim: int = 256
    use_decoder_adapter: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        grid = self.image_size // 16  # 64 for 1024
        self.prompt_encoder = PromptEncoder(
            embed_dim=self.embed_dim,
            image_embedding_size=(grid, grid),
            input_image_size=(self.image_size, self.image_size),
            mask_in_chans=16, dtype=self.dtype)
        self.mask_decoder = MaskDecoder(
            transformer_dim=self.embed_dim,
            num_multimask_outputs=self.num_classes,
            use_adapter=self.use_decoder_adapter, dtype=self.dtype)

    def __call__(self, images: jnp.ndarray, points=None, boxes=None,
                 masks=None, multimask_output: bool = True,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images: (B, S, S, 3) already normalized. Returns
        (logits (B, K, S/4, S/4), iou_pred (B, K))."""
        embeddings = self.image_encoder(images, train=train)
        sparse, dense = self.prompt_encoder(
            points=points, boxes=boxes, masks=masks,
            batch_size=images.shape[0])
        image_pe = self.prompt_encoder.get_dense_pe()
        return self.mask_decoder(embeddings, image_pe, sparse, dense,
                                 multimask_output=multimask_output)

    def encode(self, images, train: bool = False):
        return self.image_encoder(images, train=train)


def preprocess_frames(frames: jnp.ndarray, image_size: int = 1024) -> jnp.ndarray:
    """(B, H, W, 3) uint8 -> (B, S, S, 3) ImageNet-normalized float32
    (reference evaluate_1_slice: PIL resize to 1024^2, ToTensor, Normalize)."""
    x = frames.astype(jnp.float32) / 255.0
    x = jax.image.resize(
        x, (x.shape[0], image_size, image_size, 3), method="bilinear")
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def make_clip_segmentor(model: Sam, variables: Any, out_hw: Optional[Tuple[int, int]] = None,
                        micro_batch: int = 4,
                        mesh=None,
                        weights_int8: bool = False) -> Callable[[np.ndarray], np.ndarray]:
    """Build a callable (N, H, W, 3) uint8 -> (N, H, W) uint8 labels.

    Frames are processed in fixed-size micro-batches under one jit (padding
    the tail batch) so arbitrary clip lengths reuse a single compiled
    program; the argmax'd 256x256 prediction is NEAREST-resized to the
    original frame size, matching the reference's PIL resample
    (calculate_optical_flow.py:85-87).

    ``weights_int8`` stores every matmul/conv kernel as symmetric
    per-channel int8 (models/quantize.py) and dequantizes to the model's
    compute dtype inside the jitted program — kernels live in HBM (and
    cross the host->device link) at half the bf16 byte count; compute is
    unchanged. The reference has no quantized path; this is a
    TPU-serving knob.

    With ``mesh`` the segmentor runs frame-axis data-parallel over the
    mesh's 'data' axis: parameters replicate once, each micro-batch
    shards its frame axis, XLA partitions the encoder with zero
    collectives (frames are independent). This is the multi-chip serving
    analog of flow/pipeline.compute_clip_flow_sharded — the reference's
    2-GPU torch split (DDP_splitgpu image_encoder.py:99-104) pinned
    *layers* to devices; sharding the embarrassingly-parallel frame axis
    is the mapping that actually scales on a TPU pod slice.
    """
    if weights_int8:
        from .quantize import dequantize_variables, quantize_variables_int8

        variables = quantize_variables_int8(variables)

        def _model_vars(v):
            return dequantize_variables(v, model.dtype)
    else:

        def _model_vars(v):
            return v

    if mesh is not None:
        from ..exceptions import ShardingError
        from ..parallel.mesh import batch_sharding, replicated_sharding

        if micro_batch % mesh.shape["data"]:
            raise ShardingError(
                f"micro_batch={micro_batch} not divisible by the mesh "
                f"data axis ({mesh.shape['data']})")
        variables = jax.device_put(variables, replicated_sharding(mesh))

        def _place(chunk):
            return jax.device_put(chunk, batch_sharding(mesh, np.ndim(chunk)))
    else:
        _place = jax.device_put
        # commit the (possibly int8-quantized) tree to device once; passed
        # as a jit ARGUMENT below — not a closure constant — so XLA cannot
        # constant-fold the dequantize into embedded bf16 weight constants
        # (which would silently negate the int8 HBM-residency savings and
        # duplicate the weights per compiled program)
        variables = jax.device_put(variables)

    @functools.partial(jax.jit, static_argnames=())
    def run_batch(v, batch_u8):
        x = preprocess_frames(batch_u8, model.image_size)
        logits, _ = model.apply(_model_vars(v), x, multimask_output=True)
        return jnp.argmax(logits, axis=1).astype(jnp.uint8)  # (B, 256, 256)

    @functools.partial(jax.jit, static_argnames=())
    def run_batch_gray(v, batch_u8_gray):
        # (B, H, W) uint8 single channel: resize before the channel
        # broadcast (1/3 the resize work; echo clips are RGB-coded gray)
        s = model.image_size
        x = batch_u8_gray.astype(jnp.float32) / 255.0
        x = jax.image.resize(x, (x.shape[0], s, s), method="bilinear")
        x = (x[..., None] - IMAGENET_MEAN) / IMAGENET_STD
        logits, _ = model.apply(_model_vars(v), x, multimask_output=True)
        return jnp.argmax(logits, axis=1).astype(jnp.uint8)

    def _batch_starts(n: int):
        """Chunk starts with the shifted (overlapping) tail so every
        chunk has the full micro_batch shape (one compiled program)."""
        starts = []
        for start in range(0, n, micro_batch):
            starts.append(min(start, n - micro_batch) if n >= micro_batch
                          else 0)
        return starts

    def _stitch(outs, n: int, xp):
        """Concatenate chunk outputs and drop the shifted-tail overlap /
        short-clip padding; ``xp`` is np (host path) or jnp (device)."""
        pred = xp.concatenate(outs, axis=0)
        if n < micro_batch:  # single padded batch: drop the padding
            return pred[:n]
        if pred.shape[0] != n:  # drop the overlap of the shifted tail
            tail_keep = n - (pred.shape[0] - micro_batch)
            return xp.concatenate([pred[:-micro_batch], pred[-tail_keep:]],
                                  axis=0)
        return pred

    def _nearest_idx(pred_hw, th: int, tw: int):
        yi = (np.arange(th) * pred_hw[0] // th).clip(0, pred_hw[0] - 1)
        xi = (np.arange(tw) * pred_hw[1] // tw).clip(0, pred_hw[1] - 1)
        return yi, xi

    def labels_device(clip_dev: jnp.ndarray,
                      clip_hw: Tuple[int, int]) -> jnp.ndarray:
        """Device-resident fast path: (N, H, W[, 3]) uint8 ALREADY on
        device -> (N, th, tw) uint8 labels, never touching the host (no
        re-upload, no label download; flow/segment.predict_movie feeds
        the result straight into the on-device mask cleanup). A
        constructor-level ``out_hw`` overrides ``clip_hw``, matching the
        host path's resolution contract."""
        n = clip_dev.shape[0]
        run = run_batch_gray if clip_dev.ndim == 3 else run_batch
        outs = []
        for s in _batch_starts(n):
            chunk = clip_dev[s:s + micro_batch]
            if chunk.shape[0] < micro_batch:
                reps = micro_batch - chunk.shape[0]
                chunk = jnp.concatenate(
                    [chunk, jnp.repeat(chunk[-1:], reps, 0)], 0)
            outs.append(run(variables, _place(chunk)))
        pred = _stitch(outs, n, jnp)
        th, tw = out_hw or clip_hw
        yi, xi = _nearest_idx(pred.shape[1:3], th, tw)
        return jnp.take(jnp.take(pred, yi, axis=1), xi, axis=2)

    def segment(frames: np.ndarray) -> np.ndarray:
        frames = np.asarray(frames)
        n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
        th, tw = out_hw or (h, w)
        # pipelined uploads: device_put is async, so staging every uint8
        # micro-batch up front and then dispatching all compute lets the
        # host->device transfers overlap the encoder (the tunnel-style
        # links this runs over move tens of MB/s; a single blocking
        # upload serialized ~2/3 of the clip time, measured on v5e)
        chunks = []
        for s in _batch_starts(n):
            chunk = frames[s:s + min(micro_batch, n)]
            if chunk.shape[0] < micro_batch:  # clip shorter than one batch
                reps = micro_batch - chunk.shape[0]
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], reps, 0)], 0)
            chunks.append(_place(chunk))
        outs = [run_batch(variables, c) for c in chunks]
        pred = _stitch([np.asarray(o) for o in outs], n, np)
        # NEAREST upsample back to the clip resolution
        yi, xi = _nearest_idx(pred.shape[1:3], th, tw)
        return pred[:, yi[:, None], xi[None, :]]

    segment.labels_device = labels_device
    return segment
