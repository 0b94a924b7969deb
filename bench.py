"""Headline benchmark: TV-L1 dense optical flow, frames/sec/chip.

Matches the BASELINE.md north-star metric: dense TV-L1 flow over a TEE
clip at native resolution (480x640) with the reference's OpenCV-default
solver settings (5 scales @0.8, 5 warps, 10x30 primal-dual iterations,
lambda 0.15, 5x5 flow median), batched over all frame pairs on one chip.

The baseline divisor is the same compiled program on this host's CPU via
XLA — a *stronger* baseline than the reference's single-threaded OpenCV
DualTVL1 (measured in the literature at ~0.5-2 s/frame at VGA), so
``vs_baseline`` is conservative.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _make_clip(n: int, h: int, w: int) -> np.ndarray:
    """Synthetic speckle clip with smooth global motion, in [0, 255]."""
    rng = np.random.default_rng(0)
    base = rng.uniform(size=(h + 16, w + 16)).astype(np.float32)
    # smooth the speckle a little (separable box blur x2)
    for axis in (0, 1):
        base = (np.roll(base, 1, axis) + base + np.roll(base, -1, axis)) / 3.0
    frames = np.empty((n, h, w), np.float32)
    for i in range(n):
        dy = int(round(4 * np.sin(2 * np.pi * i / n)))
        dx = int(round(4 * np.cos(2 * np.pi * i / n)))
        frames[i] = base[8 + dy:8 + dy + h, 8 + dx:8 + dx + w]
    lo, hi = frames.min(), frames.max()
    return (frames - lo) / (hi - lo) * 255.0


def _time_flow(device, frames, reps: int, params) -> float:
    import jax
    import jax.numpy as jnp

    from tee_optical_flow_tpu.ops.tvl1 import tvl1_flow_pairs

    with jax.default_device(device):
        i0 = jnp.asarray(frames[:-1])
        i1 = jnp.asarray(frames[1:])
        flow = tvl1_flow_pairs(i0, i1, **params)  # compile + warm
        flow.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(reps):
            flow = tvl1_flow_pairs(i0, i1, **params)
            flow.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
    return dt


def main() -> None:
    import jax

    params = dict(lam=0.15, tau=0.25, theta=0.3, nscales=5, zoom=0.8,
                  warps=5, outer_iters=10, inner_iters=30, use_median=True)
    h, w = 480, 640

    tpu_devices = [d for d in jax.devices() if d.platform != "cpu"]
    cpu = jax.devices("cpu")[0] if any(
        d.platform == "cpu" for d in jax.local_devices()) else None
    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        cpu = None

    if tpu_devices:
        n_frames = 17  # 16 pairs resident in HBM
        clip = _make_clip(n_frames, h, w)
        dt = _time_flow(tpu_devices[0], clip, reps=3, params=params)
        fps = (n_frames - 1) / dt
    else:
        # CPU-only environment: still produce the metric (slower)
        n_frames = 3
        clip = _make_clip(n_frames, h, w)
        dt = _time_flow(jax.devices()[0], clip, reps=1, params=params)
        fps = (n_frames - 1) / dt

    vs_baseline = None
    if cpu is not None and tpu_devices:
        # CPU baseline: same program via XLA on this host, few pairs
        cpu_clip = clip[:3]
        cpu_dt = _time_flow(cpu, cpu_clip, reps=1, params=params)
        cpu_fps = (len(cpu_clip) - 1) / cpu_dt
        vs_baseline = fps / cpu_fps

    print(json.dumps({
        "metric": "tvl1_flow_frames_per_sec_per_chip_480x640",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
