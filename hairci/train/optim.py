"""Optimizer construction — parity with `get_optimizer`
(`/root/reference/HairPretraining/utils/utils.py:59-71`): Adam with the
parameter set split into decay / no-decay groups (biases and norm params are
excluded from weight decay).

TPU note: the reference wraps training in fp16 `GradScaler`; on TPU we train
in bf16 compute with f32 params/optimizer state and need no loss scaling
(SURVEY.md §2.5 AMP row).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


def _is_no_decay(path: tuple, leaf) -> bool:
    # biases and any 1-D param (BN/LN scale/bias, cls tokens excluded by dim)
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if any(str(n) in ("bias", "scale") for n in names):
        return True
    return jnp.ndim(leaf) <= 1


def decay_mask(params) -> Any:
    """True where weight decay applies."""
    flat = jax.tree_util.tree_map_with_path(
        lambda p, v: not _is_no_decay(p, v), params)
    return flat


def make_optimizer(
    learning_rate,
    weight_decay: float = 0.0,
    betas=(0.9, 0.999),
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    """Adam(W) with decay/no-decay split + optional global-norm clipping
    (SHAM clips at 1.0, `pretrain_engine.py:749`)."""
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay and weight_decay > 0:
        chain.append(optax.adamw(
            learning_rate, b1=betas[0], b2=betas[1],
            weight_decay=weight_decay, mask=decay_mask))
    else:
        chain.append(optax.adam(learning_rate, b1=betas[0], b2=betas[1]))
    return optax.chain(*chain)
