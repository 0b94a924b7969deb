"""DeepFlow backend accuracy + the full train_model loop end to end."""

import os

import numpy as np
import pytest
import jax.numpy as jnp
from scipy import ndimage

from tee_optical_flow_tpu.ops.deepflow import deepflow_pairs, deepflow_clip_flow


def _texture(rng, h=64, w=64, smooth=3.0):
    img = ndimage.gaussian_filter(rng.uniform(size=(h, w)), smooth)
    img = (img - img.min()) / (img.max() - img.min())
    return (img * 255.0).astype(np.float32)


@pytest.mark.slow
def test_deepflow_recovers_subpixel_shift(rng):
    img = _texture(rng)
    dx, dy = 0.8, -0.5
    shifted = ndimage.shift(img, (dy, dx), order=3, mode="nearest")
    flow = np.asarray(deepflow_pairs(img[None], shifted[None], nscales=2,
                                     zoom=0.5, iters=20, fp_iters=2,
                                     matching=False))[0]
    interior = flow[10:-10, 10:-10]
    epe = np.hypot(interior[..., 0] - dx, interior[..., 1] - dy)
    assert np.median(epe) < 0.3, f"median EPE {np.median(epe):.3f}"


@pytest.mark.slow
def test_deepflow_zero_motion(rng):
    # same shapes (incl. batch=2) and solver statics as
    # test_deepflow_clip_shape so the two tests share one compiled
    # program (compile dominates on CPU CI). Slow tier: the fast tier
    # pins the same Jacobi math via the interpret parity test below.
    img = _texture(rng, 32, 32)
    pair = np.stack([img, img])
    flow = np.asarray(deepflow_pairs(pair, pair, nscales=2,
                                     zoom=0.5, iters=5, fp_iters=1,
                                     matching=False))
    assert np.abs(flow).max() < 0.05


@pytest.mark.slow
def test_deepflow_matching_recovers_large_displacement(rng):
    """A 12 px shift of high-frequency speckle at 96^2 exceeds the
    coarse-to-fine warping linearization range (texture aliases away at
    the coarse levels): refinement-only converges to zero flow, the
    matching term (reference DeepFlow's DeepMatching stage,
    calculate_optical_flow.py:565-568) recovers it."""
    base = rng.uniform(size=(160, 160)).astype(np.float32)
    shift = 12
    i0 = base[16:112, 16:112]
    i1 = base[16:112, 16 - shift:112 - shift]
    inner = np.s_[20:76, 20:76]

    def epe(matching):
        flow = np.asarray(deepflow_pairs(
            i0[None], i1[None], nscales=3, iters=30, matching=matching,
            match_radius=7, beta=0.3))[0]
        return float(np.hypot(flow[..., 0][inner] - shift,
                              flow[..., 1][inner]).mean())

    assert epe(False) > 5.0, "refinement-only unexpectedly solves this"
    assert epe(True) < 1.0


def test_coarse_match_zero_motion_and_shift(rng):
    """Matches on identical images are exactly zero where confident; an
    integer shift is recovered exactly in the interior."""
    from tee_optical_flow_tpu.ops.deepflow import coarse_match

    img = _texture(rng, 48, 48, smooth=1.0)
    um, vm, conf = map(np.asarray, coarse_match(img[None], img[None],
                                                radius=4))
    sel = conf > 0
    assert sel.mean() > 0.3
    assert np.abs(um[sel]).max() == 0.0
    assert np.abs(vm[sel]).max() == 0.0

    shifted = np.roll(img, 3, axis=1)
    um, vm, conf = map(np.asarray, coarse_match(img[None], shifted[None],
                                                radius=4))
    sel = conf > 0
    sel[:, :, :8] = False   # roll wraps content at both edges
    sel[:, :, -8:] = False
    assert sel.mean() > 0.2
    np.testing.assert_allclose(um[sel], 3.0)
    np.testing.assert_allclose(vm[sel], 0.0)


@pytest.mark.slow
def test_deepflow_clip_shape(rng):
    clip = np.stack([_texture(rng, 32, 32) for _ in range(3)])
    flow = np.asarray(deepflow_clip_flow(clip, nscales=2, iters=5,
                                         fp_iters=1, matching=False))
    assert flow.shape == (2, 32, 32, 2)


@pytest.mark.slow
def test_train_model_full_loop(tmp_path, rng, mini_sam_builder):
    """The whole fine-tuning loop on a synthetic learnable task: epochs,
    eval cadence, tensorboard scalars, best-DSC checkpoint, early stop.
    Mini arch (conftest): the assertions are loop mechanics, not model
    capacity."""
    from tee_optical_flow_tpu.config import TrainConfig
    from tee_optical_flow_tpu.train.loop import train_model

    IMG = 64
    model, variables = mini_sam_builder[0](num_classes=2, image_size=IMG,
                                           seed=0)

    # learnable task: label = bright blob location
    def make_batch(seed):
        r = np.random.default_rng(seed)
        images = r.normal(scale=0.1, size=(8, IMG, IMG, 3)).astype(np.float32)
        labels = np.zeros((8, IMG // 4, IMG // 4), np.int32)
        for i in range(8):
            cy, cx = r.integers(4, IMG // 4 - 4, size=2)
            labels[i, cy - 3:cy + 3, cx - 3:cx + 3] = 1
            images[i, cy * 4 - 12:cy * 4 + 12, cx * 4 - 12:cx * 4 + 12, :] += 1.0
        return images, labels

    cfg = TrainConfig(num_cls=2, image_size=IMG, out_size=IMG // 4, b=8,
                      lr=3e-4, warmup_period=2, epochs=3, eval_interval=1,
                      early_stop_patience=10,
                      dir_checkpoint=str(tmp_path / "run0"))

    result = train_model(
        model, variables,
        train_batches=lambda: iter([make_batch(s) for s in range(2)]),
        val_batches=lambda: iter([make_batch(99)]),
        cfg=cfg, steps_per_epoch=2)

    assert result["best_dsc"] > 0
    assert len(result["history"]) >= 2
    # best-DSC checkpoint + args.json persisted
    assert os.path.isdir(tmp_path / "run0" / "checkpoint_best")
    assert os.path.exists(tmp_path / "run0" / "args.json")
    # tensorboard scalars written
    assert os.path.isdir(tmp_path / "run0" / "log")

    # restore round-trips
    from tee_optical_flow_tpu.train.checkpoint import load_checkpoint, load_run_config

    template = {"params": result["variables"]["params"],
                "batch_stats": result["variables"]["batch_stats"]}
    restored = load_checkpoint(str(tmp_path / "run0"), template)
    assert set(restored) >= {"params"}
    rc = load_run_config(str(tmp_path / "run0"))
    assert rc.num_cls == 2 and rc.image_size == IMG


def test_train_state_resume(tmp_path, rng):
    """Optimizer-state save/resume round-trip (beyond the reference's
    unused epoch_ini flag)."""
    import optax
    from tee_optical_flow_tpu.train.checkpoint import (
        load_train_state, save_train_state)

    trainable = {"w": np.ones((4, 4), np.float32)}
    frozen = {"f": np.zeros(3, np.float32)}
    stats = {"bn": {"mean": np.zeros(4, np.float32)}}
    tx = optax.adamw(1e-3)
    opt_state = tx.init(trainable)

    save_train_state(str(tmp_path), trainable, frozen, stats, opt_state,
                     epoch=7, iter_num=42)
    template = {"trainable": trainable, "frozen": frozen,
                "batch_stats": stats, "opt_state": opt_state}
    state, epoch, it = load_train_state(str(tmp_path), template)
    assert epoch == 7 and it == 42
    np.testing.assert_array_equal(state["trainable"]["w"], trainable["w"])


def test_deepflow_pallas_sor_matches_xla_interpret(rng):
    """Interpret-mode parity of the VMEM-resident psi x red-black-SOR
    kernel vs the XLA _sor_sweeps, with and without the matching soft
    constraint (odd shape exercises the lane-padding masks AND the
    checkerboard parity over padded columns)."""
    from tee_optical_flow_tpu.ops.deepflow import _sor_sweeps
    from tee_optical_flow_tpu.ops.deepflow_pallas import sor_sweeps_pallas
    from tee_optical_flow_tpu.ops.warp import centered_gradient

    b, h, w = 2, 21, 37

    def f(scale):
        return (rng.normal(size=(b, h, w)) * scale).astype(np.float32)

    i0, i1w = f(40.0) + 100.0, f(40.0) + 100.0
    i1wx, i1wy = f(8.0), f(8.0)
    i1wxx, i1wxy, i1wyy = f(2.0), f(2.0), f(2.0)
    u0, v0 = f(0.8), f(0.8)
    um, vm = f(1.0), f(1.0)
    conf = np.abs(f(1.0))
    kw = dict(alpha=8.0, delta=0.5, gamma=5.0, psi_iters=2, sor_iters=5,
              omega=1.6)

    it = i1w - i0
    i0x, i0y = centered_gradient(i0)
    itx = np.asarray(i1wx - np.asarray(i0x))
    ity = np.asarray(i1wy - np.asarray(i0y))

    for match in (None, (um, vm, conf)):
        ref = _sor_sweeps(i0, i1w, i1wx, i1wy, i1wxx, i1wxy, i1wyy,
                          u0, v0, match=match, beta=0.3, **kw)
        got = sor_sweeps_pallas(
            i1wx, i1wy, i1wxx, i1wxy, i1wyy, it, itx, ity, u0, v0,
            match, beta=0.3, interpret=True, **kw)
        tag = "match" if match is not None else "plain"
        for name, a, c in zip(("du", "dv"), ref, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=1e-4,
                                       err_msg=f"{tag}:{name}")
