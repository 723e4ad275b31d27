"""Train state pytree.

The TPU counterpart of the reference checkpoint dict
(`/root/reference/HairPretraining/src/pretrain_engine.py:792-800`:
{epoch, model, optimizer, scaler, args, losses}) plus what the reference
*fails* to persist — the EMA/momentum copies and the hard-negative cache
(`pretrain_engine.py:169-171` leaves hard negatives unrestored on resume;
we carry them in the state so Orbax snapshots them atomically).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import core, struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # EMA/momentum teacher copies (SHAM2/BYOL/DINO/DenseCL/MSN/SiameseIM)
    ema_params: Optional[core.FrozenDict] = None
    ema_batch_stats: Optional[core.FrozenDict] = None
    # staged hard-negative mining cache: per-batch neighbor indices
    # (SHAM `hard_neg_indices.pt`, `pretrain_engine.py:650`)
    neg_indices: Optional[jnp.ndarray] = None
    # method-specific extra state (e.g. DINO center)
    extra: Any = None

    def apply_gradients(self, grads, **kwargs):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            **kwargs,
        )


def ema_update(ema_tree, online_tree, momentum: float):
    """lightly `update_momentum` parity (`utils/utils.py:113-118`):
    ema = ema * m + online * (1 - m)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * momentum + p * (1.0 - momentum),
        ema_tree, online_tree)
