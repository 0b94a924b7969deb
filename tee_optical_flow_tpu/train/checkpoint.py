"""Checkpoint persistence: best-DSC snapshot + resolved run config.

Parity with the reference's artifacts: ``checkpoint_best`` per run
(SingleGPU_train_finetune_noprompt.py:181-185) and ``args.json``
(:202-206) so inference can rebuild the exact model
(calculate_optical_flow.py:673-693). Uses orbax for the pytree snapshot.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax

from ..config import TrainConfig
from ..utils import safe_makedir


def save_checkpoint(dir_checkpoint: str, state: Dict[str, Any],
                    cfg: Optional[TrainConfig] = None,
                    name: str = "checkpoint_best") -> str:
    import orbax.checkpoint as ocp

    safe_makedir(dir_checkpoint)
    path = os.path.abspath(os.path.join(dir_checkpoint, name))
    state = {k: v for k, v in state.items() if v is not None}
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.tree.map(lambda x: x, state), force=True)
    if cfg is not None:
        cfg.to_json(os.path.join(dir_checkpoint, "args.json"))
    return path


def load_checkpoint(dir_checkpoint: str, template: Dict[str, Any],
                    name: str = "checkpoint_best") -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(dir_checkpoint, name))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


def load_run_config(dir_checkpoint: str) -> TrainConfig:
    """Rebuild the TrainConfig an inference run needs (the reference reads
    args.json back as a Namespace, calculate_optical_flow.py:679-687)."""
    with open(os.path.join(dir_checkpoint, "args.json")) as f:
        return TrainConfig.from_dict(json.load(f))


def save_train_state(dir_checkpoint: str, trainable, frozen, batch_stats,
                     opt_state, epoch: int, iter_num: int,
                     name: str = "train_state") -> str:
    """Mid-run resume snapshot including optimizer state — a capability the
    reference lacks (its epoch_ini flag is unused, cfg.py:32)."""
    import orbax.checkpoint as ocp

    safe_makedir(dir_checkpoint)
    path = os.path.abspath(os.path.join(dir_checkpoint, name))
    state = {"trainable": trainable, "frozen": frozen,
             "batch_stats": batch_stats, "opt_state": opt_state}
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.tree.map(lambda x: x, state), force=True)
    with open(os.path.join(dir_checkpoint, "train_progress.json"), "w") as f:
        json.dump({"epoch": epoch, "iter_num": iter_num}, f)
    return path


def load_train_state(dir_checkpoint: str, template: Dict[str, Any],
                     name: str = "train_state"):
    """Restore (state_dict, epoch, iter_num) saved by save_train_state."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(dir_checkpoint, name))
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path, template)
    progress = {"epoch": 0, "iter_num": 0}
    ppath = os.path.join(dir_checkpoint, "train_progress.json")
    if os.path.exists(ppath):
        with open(ppath) as f:
            progress = json.load(f)
    return state, int(progress["epoch"]), int(progress["iter_num"])
