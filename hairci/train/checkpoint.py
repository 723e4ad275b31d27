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


def restore_params_only(path: str, state: TrainState,
                        keys=("params", "batch_stats", "ema_params",
                              "ema_batch_stats")) -> TrainState:
    """Partial restore for evaluation: only the model weights, ignoring
    optimizer state and method-specific caches whose shapes depend on the
    training configuration (e.g. the SHAM neg_indices cache sized by
    num_batches × batch_size)."""
    ckptr = ocp.PyTreeCheckpointer()
    full = _to_save(state)
    template = {
        k: jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, full[k])
        for k in keys if full.get(k) is not None
    }
    restored = ckptr.restore(
        os.path.abspath(path),
        restore_args=jax.tree_util.tree_map(
            lambda s: ocp.RestoreArgs(restore_type=np.ndarray), template),
        transforms={},  # drop checkpoint keys absent from the template
        item=template,
    )
    return state.replace(**restored)


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
