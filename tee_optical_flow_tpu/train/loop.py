"""SAM fine-tuning loop: optax AdamW + warmup->poly, DP over the mesh.

Parity with reference SingleGPU_train_finetune_noprompt.py:45-190 and the
DDP variant (DDP_splitgpu_train_finetune_noprompt.py): same optimizer
(AdamW, betas (0.9, 0.999), eps 1e-8, weight decay 0.1, base lr =
lr/warmup_period), same Dice+CE loss, eval every 2 epochs with
dice_coeff_multi_class, best-DSC checkpointing, 20-stale-epoch early stop,
and the same tensorboard scalar names (info/lr, info/total_loss,
info/loss_ce, info/loss_dice, eval/loss, eval/dice).

The distributed design replaces DDP+gloo+manual 2-GPU split with one
jitted step whose batch is sharded over the mesh's 'data' axis and whose
parameters/optimizer state are replicated (optionally sharded over
'model'); XLA inserts the gradient all-reduce that DDP did by hook.

Freeze policies (reference :52-70) are parameter-tree partitions:
  vanilla            everything trains (encoder optionally frozen)
  adapter            only leaves under an '*adapter*' module train
  lora               only LoRA factors train; they merge into stop-grad
                     base weights inside the loss (models/lora.py)
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util

from ..config import TrainConfig
from ..parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from ..utils import safe_makedir
from .losses import combined_loss, dice_coeff_multi_class
from .schedule import warmup_poly_schedule

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# parameter partitioning (freeze policies)
# ---------------------------------------------------------------------------

def partition_params(params: Dict, trainable_pred: Callable[[Tuple[str, ...]], bool]):
    """Split params into (trainable, frozen) trees by path predicate."""
    flat = traverse_util.flatten_dict(params)
    trainable = {k: v for k, v in flat.items() if trainable_pred(k)}
    frozen = {k: v for k, v in flat.items() if not trainable_pred(k)}
    return (traverse_util.unflatten_dict(trainable),
            traverse_util.unflatten_dict(frozen))


def merge_params(trainable: Dict, frozen: Dict) -> Dict:
    flat = dict(traverse_util.flatten_dict(frozen))
    flat.update(traverse_util.flatten_dict(trainable))
    return traverse_util.unflatten_dict(flat)


def trainable_predicate(finetune_type: str, if_update_encoder: bool):
    def pred(path: Tuple[str, ...]) -> bool:
        joined = "/".join(str(p) for p in path).lower()
        if finetune_type == "adapter":
            return "adapter" in joined
        if finetune_type == "vanilla":
            if not if_update_encoder and path[0] == "image_encoder":
                return False
            return True
        if finetune_type == "lora":
            # base weights all frozen; LoRA factors live in their own tree
            return False
        raise ValueError(f"unknown finetune_type {finetune_type}")

    return pred


# ---------------------------------------------------------------------------
# train / eval steps
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class TrainConfigRuntime:
    """Resolved runtime bundle built from a TrainConfig."""

    cfg: TrainConfig
    mesh: Any
    schedule: Callable
    tx: optax.GradientTransformation


def build_runtime(cfg: TrainConfig, steps_per_epoch: int,
                  mesh=None) -> TrainConfigRuntime:
    mesh = mesh or make_mesh(data_axis=cfg.mesh_data_axis)
    max_iters = cfg.epochs * max(steps_per_epoch, 1)
    schedule = (warmup_poly_schedule(cfg.lr, cfg.warmup_period, max_iters,
                                     cfg.poly_power)
                if cfg.warmup else lambda step: cfg.lr)
    tx = optax.adamw(learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=cfg.weight_decay)
    if cfg.layer_lr_decay != 1.0:
        from .schedule import layer_lr_decay_transform

        tx = optax.chain(tx, layer_lr_decay_transform(cfg.layer_lr_decay))
    if cfg.grad_accum > 1:
        tx = optax.MultiSteps(tx, cfg.grad_accum)
    return TrainConfigRuntime(cfg=cfg, mesh=mesh, schedule=schedule, tx=tx)


def make_train_step(model, runtime: TrainConfigRuntime, *,
                    finetune_type: str = "vanilla",
                    if_update_encoder: bool = True,
                    lora_merge: Optional[Callable] = None,
                    remat: bool = False,
                    param_sharding_fn: Optional[Callable] = None,
                    prompt_type: Optional[str] = None):
    """Returns (init_state, train_step). State = (trainable, frozen,
    batch_stats, opt_state); batch = (images (B,S,S,3) normalized,
    labels (B,out,out) int32).

    ``param_sharding_fn(mesh, params) -> sharding pytree`` opts into model
    parallelism: parameters are committed with those shardings and XLA
    partitions the step accordingly (default: replicated = pure DP).
    """
    mesh = runtime.mesh

    def apply_model(params, batch_stats, images, boxes):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        fwd = model.apply
        if remat:
            fwd = jax.checkpoint(fwd, static_argnums=())
        # box prompts flow into the prompt encoder like the reference's
        # box-prompted fine-tune (SingleGPU_train_finetune_box.py:93-105)
        return fwd(variables, images, boxes=boxes, multimask_output=True,
                   train=True,
                   mutable=["batch_stats"] if batch_stats else [])

    def loss_fn(trainable, frozen, batch_stats, images, labels, boxes):
        if finetune_type == "lora":
            params = lora_merge(frozen, trainable)
        else:
            params = merge_params(trainable, frozen)
            params = jax.tree.map(lambda x: x, params)
        (out, mutated) = apply_model(params, batch_stats, images, boxes)
        logits, _iou = out
        total, ld, lc = combined_loss(logits, labels)
        new_stats = mutated.get("batch_stats", batch_stats) if mutated else batch_stats
        return total, (ld, lc, new_stats)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def _step(trainable, frozen, batch_stats, opt_state, images, labels,
              boxes=None):
        (total, (ld, lc, new_stats)), grads = grad_fn(
            trainable, frozen, batch_stats, images, labels, boxes)
        updates, new_opt = runtime.tx.update(grads, opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        metrics = {"total_loss": total, "loss_dice": ld, "loss_ce": lc}
        return new_trainable, new_stats, new_opt, metrics

    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh, ndim=4)
    lsh = batch_sharding(mesh, ndim=3)
    _jitted = jax.jit(_step, donate_argnums=(0, 2, 3))

    def train_step(trainable, frozen, batch_stats, opt_state, images, labels,
                   boxes=None):
        # commit the batch to the data axis; state keeps whatever sharding
        # init_state committed it with (replicated or model-sharded), and
        # XLA partitions the step from those
        images = jax.device_put(images, bsh)
        labels = jax.device_put(labels, lsh)
        if boxes is not None:
            boxes = jax.device_put(boxes, batch_sharding(mesh, ndim=boxes.ndim))
        return _jitted(trainable, frozen, batch_stats, opt_state, images,
                       labels, boxes)

    # the raw jitted step, for compile-only validation at production
    # shapes (lower + memory analysis without executing — __graft_entry__
    # dryrun_multichip's 1024^2 TP check)
    train_step.jitted = _jitted

    def init_state(variables, lora_params=None):
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if finetune_type == "lora":
            trainable = lora_params
            frozen = params
        else:
            trainable, frozen = partition_params(
                params, trainable_predicate(finetune_type, if_update_encoder))
        if not jax.tree_util.tree_leaves(trainable):
            raise ValueError(
                f"finetune_type={finetune_type!r} selected ZERO trainable "
                "parameters — for 'adapter' the model must be built with "
                "adapter modules (adapter_stages/adapter_blocks/"
                "use_decoder_adapter), for 'lora' pass init_lora factors")
        opt_state = runtime.tx.init(trainable)

        def put(tree, shardings=None):
            # fresh buffers: the train step donates its state args, and a
            # zero-copy device_put of caller-owned arrays would let the
            # donation delete the caller's buffers
            tree = jax.tree.map(jnp.array, tree)
            if shardings is None:
                return jax.device_put(tree, rep)
            return jax.tree.map(jax.device_put, tree, shardings)

        t_sh = f_sh = None
        if param_sharding_fn is not None:
            if finetune_type != "lora":
                t_sh = param_sharding_fn(mesh, trainable)
            f_sh = param_sharding_fn(mesh, frozen)
        return (put(trainable, t_sh), put(frozen, f_sh),
                put(batch_stats), put(opt_state))

    return init_state, train_step


def make_eval_step(model, runtime: TrainConfigRuntime, num_cls: int,
                   finetune_type: str = "vanilla",
                   lora_merge: Optional[Callable] = None):
    mesh = runtime.mesh

    def _eval(trainable, frozen, batch_stats, images, labels):
        if finetune_type == "lora":
            params = lora_merge(frozen, trainable)
        else:
            params = merge_params(trainable, frozen)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits, _ = model.apply(variables, images, multimask_output=True,
                                train=False)
        total, ld, lc = combined_loss(logits, labels)
        pred = jnp.argmax(logits, axis=1)
        dsc = dice_coeff_multi_class(pred, labels, num_cls)
        return total, dsc

    bsh = batch_sharding(mesh, ndim=4)
    lsh = batch_sharding(mesh, ndim=3)
    _jitted = jax.jit(_eval)

    def eval_step(trainable, frozen, batch_stats, images, labels):
        images = jax.device_put(images, bsh)
        labels = jax.device_put(labels, lsh)
        return _jitted(trainable, frozen, batch_stats, images, labels)

    return eval_step


# ---------------------------------------------------------------------------
# the full loop
# ---------------------------------------------------------------------------

def train_model(model, variables, train_batches: Callable[[], Iterable],
                val_batches: Callable[[], Iterable], cfg: TrainConfig,
                steps_per_epoch: int, lora_params=None, lora_merge=None,
                writer=None, mesh=None, resume: bool = False,
                save_state_every: int = 0) -> Dict[str, Any]:
    """Run the fine-tuning loop. ``train_batches``/``val_batches`` are
    callables returning fresh iterators of (images, labels) numpy batches
    per epoch. Returns {'variables', 'trainable', 'best_dsc', 'history'}."""
    runtime = build_runtime(cfg, steps_per_epoch, mesh)
    init_state, train_step = make_train_step(
        model, runtime, finetune_type=cfg.finetune_type,
        if_update_encoder=cfg.if_update_encoder, lora_merge=lora_merge,
        remat=cfg.remat)
    eval_step = make_eval_step(model, runtime, cfg.num_cls,
                               finetune_type=cfg.finetune_type,
                               lora_merge=lora_merge)

    trainable, frozen, batch_stats, opt_state = init_state(variables, lora_params)

    start_epoch = 0
    iter_num = 0
    if resume:
        import os as _os

        from .checkpoint import load_train_state

        if _os.path.isdir(_os.path.join(cfg.dir_checkpoint, "train_state")):
            template = {"trainable": trainable, "frozen": frozen,
                        "batch_stats": batch_stats, "opt_state": opt_state}
            state, start_epoch, iter_num = load_train_state(
                cfg.dir_checkpoint, template)
            trainable = state["trainable"]
            frozen = state["frozen"]
            batch_stats = state["batch_stats"]
            opt_state = state["opt_state"]
            logger.info("resumed from epoch %d (iter %d)", start_epoch, iter_num)

    if writer is None:
        try:
            from tensorboardX import SummaryWriter

            safe_makedir(os.path.join(cfg.dir_checkpoint, "log"))
            writer = SummaryWriter(os.path.join(cfg.dir_checkpoint, "log"))
        except Exception:
            # declared as the 'tensorboard' extra (pyproject); training
            # is unaffected, only the tfevents artifact is skipped
            logger.warning(
                "tensorboardX unavailable — no tensorboard scalars will "
                "be written (pip install tee-optical-flow-tpu[tensorboard])")
            writer = None

    best_dsc = -1.0
    last_update_epoch = start_epoch
    history = []
    for epoch in range(start_epoch, cfg.epochs):
        epoch_loss = 0.0
        nsteps = 0
        t0 = time.perf_counter()
        for images, labels in train_batches():
            trainable, batch_stats, opt_state, metrics = train_step(
                trainable, frozen, batch_stats, opt_state,
                jnp.asarray(images), jnp.asarray(labels))
            epoch_loss += float(metrics["total_loss"])
            nsteps += 1
            iter_num += 1
            if writer is not None:
                writer.add_scalar("info/lr", float(runtime.schedule(iter_num)), iter_num)
                writer.add_scalar("info/total_loss", float(metrics["total_loss"]), iter_num)
                writer.add_scalar("info/loss_ce", float(metrics["loss_ce"]), iter_num)
                writer.add_scalar("info/loss_dice", float(metrics["loss_dice"]), iter_num)
        train_loss = epoch_loss / max(nsteps, 1)
        logger.info("Epoch %d | train loss %.4f | %.1fs", epoch, train_loss,
                    time.perf_counter() - t0)

        if epoch % cfg.eval_interval == 0:
            eval_loss = 0.0
            dsc = 0.0
            n = 0
            for images, labels in val_batches():
                l, d = eval_step(trainable, frozen, batch_stats,
                                 jnp.asarray(images), jnp.asarray(labels))
                eval_loss += float(l)
                dsc += float(d)
                n += 1
            eval_loss /= max(n, 1)
            dsc /= max(n, 1)
            if writer is not None:
                writer.add_scalar("eval/loss", eval_loss, epoch)
                writer.add_scalar("eval/dice", dsc, epoch)
            logger.info("Eval Epoch %d | val loss %.4f | dsc %.4f",
                        epoch, eval_loss, dsc)
            history.append({"epoch": epoch, "train_loss": train_loss,
                            "eval_loss": eval_loss, "dice": dsc})
            if dsc > best_dsc:
                best_dsc = dsc
                last_update_epoch = epoch
                from .checkpoint import save_checkpoint

                save_checkpoint(cfg.dir_checkpoint,
                                {"params": merge_params(trainable, frozen)
                                 if cfg.finetune_type != "lora" else frozen,
                                 "batch_stats": batch_stats,
                                 "lora": trainable if cfg.finetune_type == "lora" else None},
                                cfg)
            elif (epoch - last_update_epoch) > cfg.early_stop_patience:
                logger.info("Training finished (early stop at epoch %d)", epoch)
                break

        if save_state_every and (epoch + 1) % save_state_every == 0:
            from .checkpoint import save_train_state

            save_train_state(cfg.dir_checkpoint, trainable, frozen,
                             batch_stats, opt_state, epoch + 1, iter_num)

    if writer is not None:
        writer.close()
    final = {"params": merge_params(trainable, frozen)
             if cfg.finetune_type != "lora" else frozen,
             "batch_stats": batch_stats}
    return {"variables": final, "trainable": trainable,
            "best_dsc": best_dsc, "history": history}
