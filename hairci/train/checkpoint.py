"""Orbax checkpointing of the TrainState pytree.

Mirrors the reference cadence (`/root/reference/HairPretraining/src/
pretrain_engine.py:787-816`): a periodic checkpoint every ``every`` epochs
plus a ``latest`` updated each epoch; resume restores everything the
reference restores (model/optimizer/epoch, `pretrain_engine.py:127-174`)
PLUS the EMA trees and hard-negative cache the reference loses on resume.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from hairci.train.state import TrainState

PERIODIC_RE = re.compile(r"model_ckpt_(\d+)$")


def _to_save(state: TrainState) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "ema_params": state.ema_params,
        "ema_batch_stats": state.ema_batch_stats,
        "neg_indices": state.neg_indices,
        "extra": state.extra,
    }


def save_checkpoint(save_path: str, name: str, state: TrainState,
                    epoch: int) -> str:
    """Write `<save_path>/<name>` (e.g. model_ckpt_latest / model_ckpt_50)."""
    path = os.path.abspath(os.path.join(save_path, name))
    ckptr = ocp.StandardCheckpointer()
    payload = dict(_to_save(state), epoch=np.asarray(epoch))
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, state: TrainState) -> Tuple[TrainState, int]:
    """Restore into the (abstract) structure of ``state``."""
    ckptr = ocp.StandardCheckpointer()
    template = dict(
        jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, _to_save(state)),
        epoch=np.asarray(0),
    )
    restored = ckptr.restore(os.path.abspath(path), template)
    epoch = int(restored.pop("epoch"))
    return state.replace(**restored), epoch


def get_latest_checkpoint(folder: str) -> Optional[str]:
    """`get_latest_checkpoint` parity (`utils/utils.py:120-137`): prefer the
    ``model_ckpt_latest`` dir, else the highest-numbered periodic one."""
    if not os.path.isdir(folder):
        return None
    latest = os.path.join(folder, "model_ckpt_latest")
    if os.path.isdir(latest):
        return latest
    best, best_n = None, -1
    for entry in os.listdir(folder):
        m = PERIODIC_RE.match(entry)
        if m and int(m.group(1)) > best_n:
            best, best_n = os.path.join(folder, entry), int(m.group(1))
    return best
