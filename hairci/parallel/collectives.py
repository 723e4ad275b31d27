"""Collective helpers — equivalents of the reference's distributed utilities
(`/root/reference/src/util/misc.py`), expressed the JAX way.

Most of the reference's machinery DISAPPEARS by construction:
  - `GatherLayer` (fwd all_gather / bwd all_reduce, `misc.py:519-536`):
    `jax.lax.all_gather` is natively differentiable; under plain `jit` with a
    sharded batch you don't even call it — computing over the global array
    inserts the collective.
  - `all_reduce_mean` (`misc.py:402-410`): `jax.lax.pmean`, or a global
    `jnp.mean` under jit.
  - `init_distributed_mode` (`misc.py:221-277`, NCCL/env/SLURM/OMPI
    rendezvous): `jax.distributed.initialize()` (one call; DCN rendezvous is
    env-driven).
  - `NodeDistributedSampler` (`misc.py:452-516`): per-host manifest slicing
    (`shard_for_host`).
  - `setup_for_distributed` print gating (`misc.py:175`): `is_main_process`.

These helpers exist for code that opts into explicit `shard_map` regions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hairci.parallel.mesh import DATA_AXIS


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host init (`init_distributed_mode` equivalent). No-op when
    single-process (the common case under a single TPU slice host)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def is_main_process() -> bool:
    return jax.process_index() == 0


def all_gather(x: jnp.ndarray, axis_name: str = DATA_AXIS) -> jnp.ndarray:
    """GatherLayer equivalent inside shard_map/pmap regions: differentiable
    all-gather, concatenated along the leading dim."""
    return jax.lax.all_gather(x, axis_name, tiled=True)


def all_reduce_mean(x: jnp.ndarray, axis_name: str = DATA_AXIS) -> jnp.ndarray:
    return jax.lax.pmean(x, axis_name)


def shard_for_host(n: int, process_index: Optional[int] = None,
                   process_count: Optional[int] = None) -> np.ndarray:
    """Contiguous per-host index shard of a length-n dataset
    (NodeDistributedSampler's node-aware sharding, `misc.py:452-516`)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = (n + pc - 1) // pc
    start = pi * per
    return np.arange(start, min(start + per, n))
