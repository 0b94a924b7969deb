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
