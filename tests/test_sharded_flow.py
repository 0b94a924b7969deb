"""Multi-device capabilities: frame-axis-sharded flow, box-prompted train
step, GAN helpers — on the 8-way CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import ndimage

from tee_optical_flow_tpu.config import OpticalFlowCalculationConfig, TrainConfig
from tee_optical_flow_tpu.flow.pipeline import compute_clip_flow, compute_clip_flow_sharded
from tee_optical_flow_tpu.parallel.mesh import make_mesh


def _texture(rng, h=48, w=48):
    img = ndimage.gaussian_filter(rng.uniform(size=(h, w)), 3.0)
    img = (img - img.min()) / (img.max() - img.min())
    return (img * 255.0).astype(np.float32)


@pytest.mark.slow
def test_sharded_clip_flow_matches_single(rng):
    # 6 frames -> 5 pairs, padded to 8 across the data axis
    f0 = _texture(rng)
    frames = np.stack([ndimage.shift(f0, (0, i * 0.5), order=3, mode="nearest")
                       for i in range(6)])
    cfg = OpticalFlowCalculationConfig(
        tvl1_nscales=2, tvl1_zoom_factor=0.5, tvl1_warps=2,
        tvl1_outer_iterations=2, tvl1_inner_iterations=10,
        tvl1_median_filtering=False, tvl1_use_pallas=False)
    mesh = make_mesh()
    single = np.asarray(compute_clip_flow(jnp.asarray(frames), "TVL1", cfg))
    sharded = np.asarray(compute_clip_flow_sharded(frames, mesh, "TVL1", cfg))
    assert sharded.shape == single.shape == (5, 48, 48, 2)
    # XLA partitions the sharded solve differently, so f32 reassociation
    # permits tiny per-element drift (bicubic's extra warp FMAs put the
    # worst element at ~1.1e-4)
    np.testing.assert_allclose(sharded, single, atol=2e-4)
    # and the motion is actually recovered
    assert abs(np.median(sharded[0, 8:-8, 8:-8, 0]) - 0.5) < 0.2


@pytest.mark.slow
def test_box_prompted_train_step(rng, mini_sam_builder):
    """Box prompts through the DP train step (reference
    SingleGPU_train_finetune_box.py:93-105) on the mini arch — the
    assertion is prompt wiring, not model size."""
    from tee_optical_flow_tpu.train.loop import build_runtime, make_train_step

    IMG = 64
    build_mini_sam, _ = mini_sam_builder
    model, variables = build_mini_sam(num_classes=2, image_size=IMG, seed=0)
    cfg = TrainConfig(num_cls=2, image_size=IMG, out_size=IMG // 4, b=8,
                      lr=1e-3, warmup_period=2, epochs=1)
    mesh = make_mesh()
    runtime = build_runtime(cfg, steps_per_epoch=1, mesh=mesh)
    init_state, train_step = make_train_step(model, runtime,
                                             prompt_type="box")
    trainable, frozen, batch_stats, opt_state = init_state(variables)

    images = rng.normal(size=(8, IMG, IMG, 3)).astype(np.float32)
    labels = rng.integers(0, 2, size=(8, IMG // 4, IMG // 4)).astype(np.int32)
    boxes = np.tile(np.array([[8.0, 8.0, 40.0, 40.0]], np.float32), (8, 1))
    trainable, batch_stats, opt_state, metrics = train_step(
        trainable, frozen, batch_stats, opt_state,
        jnp.asarray(images), jnp.asarray(labels), jnp.asarray(boxes))
    assert np.isfinite(float(metrics["total_loss"]))


@pytest.mark.slow
def test_gan_helpers(rng):
    import optax

    from tee_optical_flow_tpu.models.baselines import Discriminator
    from tee_optical_flow_tpu.train.gan import discriminator_loss, make_update_d

    disc = Discriminator(base=8)
    x = jnp.zeros((2, 16, 16, 1))
    variables = disc.init(jax.random.PRNGKey(0), x)

    def disc_apply(params, imgs):
        return disc.apply({"params": params}, imgs)

    real = jnp.asarray(rng.normal(size=(2, 16, 16, 1)), jnp.float32)
    fake = jnp.asarray(rng.normal(size=(2, 16, 16, 1)), jnp.float32)
    loss, (dr, df, gp) = discriminator_loss(
        disc_apply, variables["params"], real, fake, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)) and float(gp) >= 0

    tx = optax.adam(1e-4)
    update_d = make_update_d(disc_apply, tx)
    params, opt_state, loss2, _ = update_d(
        variables["params"], tx.init(variables["params"]), real, fake,
        jax.random.PRNGKey(2))
    assert np.isfinite(float(loss2))


@pytest.mark.slow
def test_sharded_deepflow_branch(rng):
    """The sharded path's DeepFlow branch compiles and partitions over the
    8-way mesh and forwards the config (matching off keeps it small)."""
    from tee_optical_flow_tpu.config import OpticalFlowCalculationConfig
    from tee_optical_flow_tpu.flow.pipeline import compute_clip_flow_sharded
    from tee_optical_flow_tpu.parallel.mesh import make_mesh

    frames = np.stack([_texture(rng, 32, 32) for _ in range(4)])
    cfg = OpticalFlowCalculationConfig(
        deepflow_matching=False, deepflow_fp_iterations=1,
        deepflow_sor_iterations=5, deepflow_nscales=2)
    mesh = make_mesh(8, 1)
    flow = np.asarray(compute_clip_flow_sharded(frames, mesh,
                                                of_algo="deepflow",
                                                config=cfg))
    assert flow.shape == (3, 32, 32, 2)
    assert np.isfinite(flow).all()


@pytest.mark.slow
def test_sharded_clip_segmentor_matches_single(rng, mini_sam_builder):
    """Frame-axis DP segmentation over the 8-way mesh: parameters
    replicated, micro-batch frame axis sharded over 'data' — labels must
    equal the single-device segmentor's exactly, for both the host and
    the device-resident (labels_device) paths. Mini arch: the assertion
    is sharding equality, not model size."""
    from tee_optical_flow_tpu.exceptions import ShardingError
    from tee_optical_flow_tpu.models.sam import make_clip_segmentor

    model, variables = mini_sam_builder[0](num_classes=3, image_size=64,
                                           seed=0)
    mesh = make_mesh(data_axis=8, model_axis=1)
    clip = (rng.uniform(size=(10, 40, 44, 3)) * 255).astype(np.uint8)

    single = make_clip_segmentor(model, variables, micro_batch=8)
    sharded = make_clip_segmentor(model, variables, micro_batch=8, mesh=mesh)
    np.testing.assert_array_equal(single(clip), sharded(clip))
    np.testing.assert_array_equal(
        np.asarray(single.labels_device(jnp.asarray(clip[..., 0]), (40, 44))),
        np.asarray(sharded.labels_device(jnp.asarray(clip[..., 0]), (40, 44))))

    with pytest.raises(ShardingError):
        make_clip_segmentor(model, variables, micro_batch=6, mesh=mesh)
