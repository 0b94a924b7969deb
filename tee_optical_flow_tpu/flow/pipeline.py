"""DICOM -> masks -> dense flow -> HDF5: the production pipeline.

Parity with reference process_video (calculate_optical_flow.py:478-625)
with the frame-sequential hot loops re-expressed as whole-clip device
programs:

  * SAM/otsu masks: one batched inference/threshold pass (flow/segment.py);
  * saliency or grayscale prep: one vmapped kernel over frames;
  * TV-L1 / DeepFlow: all N-1 pairs solved in one jitted multi-scale
    program (ops/tvl1.py, ops/deepflow.py) — the reference's per-pair
    GpuMat upload/calc/download boundary does not exist here;
  * WASE background compensation: the reference subtracts, per flow frame,
    the mean of the frame's flow over every nonzero entry of the *entire*
    clip's background mask stack (calculate_optical_flow.py:649-659);
    algebraically that is sum(flow * B)/count with B = sum_n bkgd_n, which
    is what the device kernel computes (O(HW) per pair instead of O(NHW));
  * schema quirks preserved: duplicate-last-flow-frame (:599), flow scaled
    by pixel_spacing*frame_rate (:600), echo stored as rgb2gray floats.
"""

from __future__ import annotations

import functools
import logging
import os
import queue
import threading
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    OpticalFlowCalculationConfig, default_optical_flow_config,
)
from ..core import (
    bucketed_frame_count, bucketed_spatial, pad_clip_frames,
    pad_spatial_edge,
)
from ..exceptions import ConfigurationError, OpticalFlowCalculationError
from ..io.dicom import extract_metadata, read_dicom_clip
from ..io.hdf5 import save_optical_flow_hdf5
from ..io.waveforms import load_all_waveforms
from ..ops.deepflow import deepflow_clip_flow
from ..ops.imaging import gray_from_clip, img2uint8_jnp
from ..ops.saliency import fine_grained_saliency
from ..ops.tvl1 import tvl1_clip_flow, tvl1_flow_pairs
from ..utils import trace_stage
from .segment import predict_movie, predict_movie_thres

logger = logging.getLogger(__name__)


@jax.jit
def _wase_background(flow_pairs: jnp.ndarray, bkgd_stack: jnp.ndarray) -> jnp.ndarray:
    """Per-pair scalar background = mean of flow over nonzero entries of the
    whole clip's bkgd masks (reference semantics, see module docstring).
    flow_pairs: (P, H, W, 2); bkgd_stack: (N, H, W, 2) bool."""
    b_sum = jnp.sum(bkgd_stack.astype(jnp.float32), axis=0)  # (H, W, 2)

    def one(fl):
        nz = (fl != 0).astype(jnp.float32)
        total = jnp.sum(fl * b_sum)
        count = jnp.sum(nz * b_sum)
        return jnp.where(count > 0, total / count, 0.0)

    bg = jax.vmap(one)(flow_pairs)
    return flow_pairs - bg[:, None, None, None]


@functools.partial(jax.jit, static_argnames=("nhw",))
def _wase_background_packed(flow_pairs: jnp.ndarray, bkgd_bits: jnp.ndarray,
                            nhw: Tuple[int, int, int]) -> jnp.ndarray:
    """_wase_background with the (N, H, W) single-channel bkgd mask
    arriving bit-packed (uint8, numpy packbits order); the two identical
    mask channels are re-broadcast on device."""
    n, h, w = nhw
    flat = jnp.unpackbits(bkgd_bits, count=n * h * w)
    bkgd = flat.reshape(n, h, w).astype(bool)
    return _wase_background(
        flow_pairs, jnp.repeat(bkgd[..., None], 2, axis=3))


def compute_clip_flow(images: jnp.ndarray, of_algo: str = "TVL1",
                      config: Optional[OpticalFlowCalculationConfig] = None
                      ) -> jnp.ndarray:
    """(N, H, W) flow-input images -> (N-1, H, W, 2) flow, on device.

    With ``config.bucket_shapes`` the solve runs at the spatial bucket
    shape (edge-replicate pad, core.py policy) and the padding is sliced
    off the returned flow, so ragged cohorts share one solver compile
    per bucket."""
    config = config or default_optical_flow_config()
    algo = of_algo.lower()
    if algo not in ("tvl1", "deepflow"):
        raise OpticalFlowCalculationError(
            "OF_algo only supports deepflow or TVL1")
    images = jnp.asarray(images)
    n, h, w = images.shape
    if config.bucket_shapes and config.spatial_bucket > 1:
        hb, wb = bucketed_spatial(h, w, config.spatial_bucket)
        images = pad_spatial_edge(images, hb, wb)
    if algo == "tvl1":
        flow = tvl1_clip_flow(images, config=config)
    else:
        flow = deepflow_clip_flow(images, config=config)
    return flow[:, :h, :w, :]


def compute_clip_flow_sharded(images, mesh, of_algo: str = "TVL1",
                              config: Optional[OpticalFlowCalculationConfig] = None
                              ) -> jnp.ndarray:
    """Multi-chip clip flow: the frame-pair axis sharded over the mesh's
    'data' axis (the honest TPU mapping of "scale the sequence axis",
    SURVEY.md §5 — pairs are independent, so no halo exchange is needed
    beyond each pair's own two frames).

    Pads the pair count to the data-axis size; XLA partitions the whole
    multi-scale solve with zero collectives.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    config = config or default_optical_flow_config()
    images = jnp.asarray(images)
    h, w = images.shape[-2:]
    if config.bucket_shapes and config.spatial_bucket > 1:
        hb, wb = bucketed_spatial(h, w, config.spatial_bucket)
        images = pad_spatial_edge(images, hb, wb)
    i0 = images[:-1]
    i1 = images[1:]
    n_pairs = i0.shape[0]
    n_data = mesh.shape["data"]
    pad = (-n_pairs) % n_data
    if pad:
        i0 = jnp.concatenate([i0, jnp.repeat(i0[-1:], pad, 0)], axis=0)
        i1 = jnp.concatenate([i1, jnp.repeat(i1[-1:], pad, 0)], axis=0)
    sharding = NamedSharding(mesh, P("data", None, None))
    i0 = jax.device_put(i0, sharding)
    i1 = jax.device_put(i1, sharding)

    if of_algo.lower() == "tvl1":
        flow = tvl1_flow_pairs(
            i0, i1, lam=config.lambda_value, tau=config.tvl1_tau,
            theta=config.tvl1_theta, nscales=config.tvl1_nscales,
            zoom=config.tvl1_zoom_factor, warps=config.tvl1_warps,
            outer_iters=config.tvl1_outer_iterations,
            inner_iters=config.tvl1_inner_iterations,
            use_median=config.tvl1_median_filtering,
            max_disp=config.tvl1_max_displacement,
            use_pallas=config.tvl1_use_pallas,
            epsilon=config.tvl1_epsilon,
            gamma=config.tvl1_gamma,
            interpolation=config.tvl1_interpolation)
    else:
        from ..ops.deepflow import deepflow_pairs

        flow = deepflow_pairs(i0, i1, alpha=config.deepflow_alpha,
                              delta=config.deepflow_delta,
                              gamma=config.deepflow_gamma,
                              iters=config.deepflow_sor_iterations,
                              psi_iters=config.deepflow_psi_iterations,
                              omega=config.deepflow_omega,
                              nscales=config.deepflow_nscales,
                              matching=config.deepflow_matching,
                              match_radius=config.deepflow_match_radius,
                              beta=config.deepflow_beta,
                              fp_iters=config.deepflow_fp_iterations,
                              max_disp=config.deepflow_max_displacement,
                              use_pallas=config.deepflow_use_pallas,
                              interpolation=config.deepflow_interpolation)
    return flow[:n_pairs, :h, :w, :]


class AsyncHDF5Writer:
    """One-deep write-behind for the pipeline's HDF5 stage.

    The gzip-9 write is the steady-state bottleneck of a clip (~8 s of a
    ~15 s clip, NOTES round 1) and runs entirely on the host, serially
    after device compute. h5py releases the GIL around HDF5 library
    calls, so a single writer thread lets clip N gzip while clip N+1's
    masks/flow run on the chip. The depth-1 queue bounds host memory to
    at most two outstanding clips (one being written plus one queued).
    Failures are captured with the originating source path
    so `process_folder`'s per-file error-isolation semantics survive
    (reference calculate_optical_flow.py:276-284).
    """

    def __init__(self) -> None:
        self._queue: "queue.Queue" = queue.Queue(maxsize=1)
        self._errors: List[Tuple[str, Exception]] = []
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                return
            src_path, write_fn = item
            try:
                write_fn()
            except Exception as exc:  # per-file isolation
                logger.error("Error writing output for %s: %s", src_path, exc)
                self._errors.append((src_path, exc))

    def submit(self, src_path: str, write_fn: Callable[[], None]) -> None:
        """Enqueue (blocks while a previous write is still in flight)."""
        self._queue.put((src_path, write_fn))

    def close(self) -> List[Tuple[str, Exception]]:
        """Drain, stop the thread, and return (src_path, error) pairs."""
        self._queue.put(None)
        self._thread.join()
        return self._errors


def process_video(dcm_path: str, save_path: str,
                  segmentor_model: Optional[Callable] = None,
                  verbose: bool = True, mode: str = "A4C",
                  bkgd_comp: str = "none", flipLR: bool = False,
                  no_saliency: bool = False, OF_algo: str = "TVL1",
                  save_mask_subset: Optional[List[str]] = None,
                  include_waveforms: bool = False,
                  waveform_folder: Optional[str] = None,
                  config: Optional[OpticalFlowCalculationConfig] = None,
                  _clip_override: Optional[np.ndarray] = None,
                  _metadata_override: Optional[Dict] = None,
                  _writer: Optional[AsyncHDF5Writer] = None) -> None:
    """Full DICOM -> HDF5 production for one clip.

    ``_clip_override``/``_metadata_override`` allow driving the pipeline
    from an in-memory (N, H, W, 3) uint8 clip (tests, non-DICOM sources);
    all other behavior matches the reference entry point. With
    ``_writer`` the HDF5 write is handed to the write-behind thread
    (process_folder's overlap path) instead of running inline; write
    errors then surface at ``_writer.close()``, keyed by ``dcm_path``.
    """
    if config is None:
        config = default_optical_flow_config()

    # reference's mode/flag validation (:509-517)
    if mode == "otsu":
        if bkgd_comp != "none":
            raise ConfigurationError(
                f"bkgd_comp {bkgd_comp} is not supported in mode=otsu, "
                "can only support bkgd_comp=none")
        if save_mask_subset is not None:
            raise ConfigurationError("In mode=otsu, save_mask_subset must be None")
    if bkgd_comp not in ("WASE", "none"):
        raise OpticalFlowCalculationError(
            f"bkgd_comp value must be [WASE, none], got {bkgd_comp}!")

    # --- read + metadata (host) ---
    with trace_stage("dicom_read"):
        if _clip_override is not None:
            nparr = np.asarray(_clip_override)
            ds = None
            metadata = dict(_metadata_override or {
                "pixel_spacing": None, "frame_rate": None,
                "R_times": None, "R_wave_data_present": False})
        else:
            ds, nparr = read_dicom_clip(dcm_path)
            metadata = extract_metadata(ds, verbose)

    pixel_spacing = metadata.get("pixel_spacing")
    frame_rate = metadata.get("frame_rate")
    conversion_factor = (1.0 if pixel_spacing is None or frame_rate is None
                         else pixel_spacing * frame_rate)
    if flipLR:
        nparr = np.flip(nparr, axis=2)
    nframes = nparr.shape[0]
    if verbose:
        logger.info("Pixel data obtained, of shape: %s", nparr.shape)

    # frame-axis bucketing (core.py): last-frame repeats are exact for
    # every real frame's masks and flow; sliced off below
    if config.bucket_shapes and config.frame_bucket > 1:
        nparr = pad_clip_frames(
            nparr, bucketed_frame_count(nframes, config.frame_bucket))

    # --- ONE clip upload feeds segmentation AND flow (the link moves
    # ~30 MB/s here; the old per-stage uploads moved the clip 2-3x). Echo
    # DICOMs are RGB-coded grayscale almost always: when R==G==B, upload
    # a single channel (1/3 the bytes; luma of R=G=B is the channel). ---
    is_gray = (nparr.ndim == 4 and nparr.shape[-1] == 3
               and np.array_equal(nparr[..., 0], nparr[..., 1])
               and np.array_equal(nparr[..., 0], nparr[..., 2]))
    clip_dev = jnp.asarray(np.ascontiguousarray(nparr[..., 0]) if is_gray
                           else nparr)
    gray = gray_from_clip(clip_dev)  # shared by otsu masks and flow prep

    # --- masks (device, batched) ---
    with trace_stage("segmentation"):
        if mode in ("A4C", "RVIO_2class", "MouseRV_A4C"):
            if segmentor_model is None:
                raise ConfigurationError(f"mode={mode} requires a segmentor model")
            mask_dict = predict_movie(nparr, segmentor_model, mode=mode,
                                      verbose=verbose, config=config,
                                      _clip_dev=clip_dev)
        elif mode == "otsu":
            mask_dict = predict_movie_thres(
                nparr, verbose=verbose, config=config, _gray_dev=gray)
        else:
            raise ConfigurationError(
                f"Input for mode must be [A4C, otsu, RVIO_2class, MouseRV_A4C], not {mode}.")
        if nparr.shape[0] != nframes:  # drop frame-bucket padding
            mask_dict = {k: v[:nframes] for k, v in mask_dict.items()}

    # --- flow input prep (device, batched over frames) ---
    with trace_stage("flow_input_prep"):
        if no_saliency:
            # per-frame img2uint8 (reference :586-588 normalizes each frame)
            images = jax.vmap(img2uint8_jnp)(gray)
        else:
            images = fine_grained_saliency(gray)

    # --- flow (device, all pairs at once) ---
    with trace_stage("optical_flow"):
        # padded (last, last) pairs solve to zero flow; slice them (and
        # the padded echo frames) off before WASE sees the arrays
        flow_pairs = compute_clip_flow(images, OF_algo, config)[:nframes - 1]
        gray = gray[:nframes]
        if bkgd_comp == "WASE":
            # the bkgd mask goes back up bit-packed (8 px/byte): both of
            # its channels are identical copies, so send one channel's
            # bits and let the kernel re-broadcast — ~24 MB -> ~1.5 MB
            # on the ~30 MB/s link
            bkgd = mask_dict["bkgd"]
            flow_pairs = _wase_background_packed(
                flow_pairs, jnp.asarray(np.packbits(bkgd[..., 0])),
                bkgd.shape[:3])
        # unit conversion (:600) and the schema storage dtype (float16,
        # io/hdf5.py) applied on device: the device->host link moves
        # ~30 MB/s here, so halving the bytes halves the transfer; both
        # DMAs start async, and materialization happens inside the write
        # closure — with a write-behind writer that means the ~2 s of
        # device->host transfer overlaps the NEXT clip's device compute
        # instead of serializing after this clip's
        flow_dev = (flow_pairs *
                    jnp.float32(conversion_factor)).astype(jnp.float16)
        echo_dev = jnp.asarray(gray, jnp.float16)
        try:
            for arr in (flow_dev, echo_dev):
                arr.copy_to_host_async()
        except Exception:  # backend without async host copies: block in _write
            pass

    # --- waveforms (host) ---
    waveform_results: Dict = {}
    if include_waveforms:
        with trace_stage("waveforms"):
            waveform_results = load_all_waveforms(
                dcm_path, waveform_folder, config, verbose)
        ecg_exists = waveform_results.get("ecg", (False, None))[0]
        art_exists = waveform_results.get("art", (False, None))[0]
        if not ecg_exists and not art_exists:
            include_waveforms = False

    # --- persist (host) ---
    patient_id = ""
    heart_rate = 0
    if ds is not None:
        patient_id = str(ds.get((0x0010, 0x0020), "") or "")
        hr = ds.get((0x0018, 0x1088))
        heart_rate = hr if hr is not None else 0
    # snapshot everything the write closure touches: nothing below is
    # mutated after this point, so the write-behind thread sees a
    # consistent clip even while the caller starts the next one
    include_wf = include_waveforms

    def _write() -> None:
        # device->host materialization lives here so the writer thread
        # pays for it (the DMAs above were already started async); a
        # failed transfer surfaces as this file's write error, keeping
        # per-file isolation (reference calculate_optical_flow.py:276-284)
        flow_host = np.asarray(flow_dev)
        echo_gray = np.asarray(echo_dev)
        # duplicate last flow frame to clip length (:599)
        flow_arr = np.concatenate([flow_host, flow_host[-1:]], axis=0)
        save_optical_flow_hdf5(
            save_path, flow_arr, echo_gray, mask_dict,
            {**metadata, "nframes": nframes},
            waveform_results, mode=mode, no_saliency=no_saliency,
            include_waveforms=include_wf, patient_id=patient_id,
            heart_rate=heart_rate,
            sampling_rates={"ecg": config.ecg_sampling_rate,
                            "art": config.art_sampling_rate,
                            "cvp": config.cvp_sampling_rate,
                            "pap": config.pap_sampling_rate},
            save_mask_subset=save_mask_subset, verbose=verbose)

    if _writer is not None:
        _writer.submit(dcm_path, _write)
    else:
        with trace_stage("hdf5_write"):
            _write()


def process_folder(dcm_dir: str, save_dir: str,
                   segmentor_model: Optional[Callable] = None,
                   nchunks: int = 1, chunk_index: int = 0,
                   recalculate: bool = False, verbose: bool = False,
                   overlap_writes: bool = True,
                   **process_kwargs) -> List[str]:
    """Shard a folder of DICOMs and process one chunk, accumulating errors
    instead of dying (reference process_folder,
    calculate_optical_flow.py:243-290). Returns the list of failed paths.

    ``overlap_writes`` (default) hands each clip's gzip-9 HDF5 write to a
    one-deep writer thread so clip N+1's device compute overlaps clip N's
    host write; failed writes still land in the error list under their
    source path."""
    from ..utils import safe_makedir

    if not os.path.isdir(dcm_dir):
        raise ConfigurationError(f"dcm_folder does not exist: {dcm_dir}")
    safe_makedir(save_dir)
    files = sorted(f for f in os.listdir(dcm_dir) if f.lower().endswith(".dcm"))
    chunks = np.array_split(np.asarray(files, dtype=object), nchunks)
    my_files = list(chunks[chunk_index]) if chunk_index < len(chunks) else []

    writer = AsyncHDF5Writer() if overlap_writes else None
    errors: List[str] = []
    try:
        for fname in my_files:
            dcm_path = os.path.join(dcm_dir, fname)
            save_path = os.path.join(save_dir, fname[:-4] + ".hdf5")
            if os.path.exists(save_path) and not recalculate:
                if verbose:
                    logger.info("%s exists, skipping", save_path)
                continue
            try:
                process_video(dcm_path, save_path, segmentor_model,
                              verbose=verbose, _writer=writer,
                              **process_kwargs)
            except Exception as exc:  # per-file isolation (reference :276-284)
                logger.error("Error processing %s: %s", dcm_path, exc)
                errors.append(dcm_path)
    finally:
        if writer is not None:
            errors.extend(src for src, _ in writer.close())
    return errors
