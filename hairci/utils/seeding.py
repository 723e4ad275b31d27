"""Determinism — `set_seed` parity (`/root/reference/HairPretraining/utils/
utils.py:105-111`). On TPU/JAX, randomness is explicit PRNG keys so there is
no global torch/cudnn state to pin; this seeds numpy (host-side shuffling)
and python's random, and returns the root jax key."""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)
