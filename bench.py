"""Headline benchmark: TV-L1 dense optical flow, frames/sec/chip.

Matches the BASELINE.md north-star metric: dense TV-L1 flow over a TEE
clip at native resolution (480x640) with the reference's OpenCV-default
solver settings (5 scales @0.8, 5 warps, 10x30 primal-dual iterations,
lambda 0.15, 5x5 flow median), batched over all frame pairs on one chip,
Pallas fused inner loop on TPU.

``vs_baseline`` divides by a recorded CPU baseline: the same compiled
program via XLA on this host's CPU measured at 0.0611 frames/s
(2 pairs in 32.7 s, single core, 2026-08-16; see /tmp provenance in the
round-1 transcript). That is the same algorithm-and-settings class as the
reference's single-threaded OpenCV DualTVL1 (literature: ~0.5-2 s/frame
at VGA), so the ratio is conservative. Re-measure with
``python bench.py --measure-cpu``.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# XLA-CPU, this host, 1 core, full OpenCV-default settings (see docstring)
RECORDED_CPU_BASELINE_FPS = 0.0611

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
    import jax
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

    n_frames = 17 if on_tpu else 3
    clip = _make_clip(n_frames, h, w)
    dt = _measure(clip, reps=3 if on_tpu else 1, use_pallas=on_tpu)
    fps = (n_frames - 1) / dt

    print(json.dumps({
        "metric": "tvl1_flow_frames_per_sec_per_chip_480x640",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / RECORDED_CPU_BASELINE_FPS, 1),
    }))


if __name__ == "__main__":
    main()
