"""Mesh conventions for hairci.

The reference reaches distribution through `torch.distributed` + NCCL
(`/root/reference/src/util/misc.py:221-277`), a `GatherLayer` autograd
all-gather (`misc.py:519-536`), and one manual tensor-parallel site (the
93k-class margin heads in `/root/reference/src/models/vit_face.py:30-46`).

TPU-native equivalent: one logical 2-D `jax.sharding.Mesh`:

  - ``data``  — batch data-parallel axis. Batches are sharded over it; under
    ``jit`` XLA inserts the gradient ``psum`` and any cross-batch collectives
    (e.g. the global NT-Xent similarity matrix) automatically — this subsumes
    GatherLayer, `all_reduce_mean`, DINO centering and the SiameseIM UniGrad
    correlation all-reduce without explicit collective calls.
  - ``model`` — tensor-parallel axis for the face-recognition margin heads:
    the (num_classes, dim) classifier weight is sharded over ``model``
    (class-partitioned, exactly the reference's per-GPU `F.linear` + concat,
    but expressed as a sharding annotation).

Multi-host: call `jax.distributed.initialize()` before `create_mesh()`; the
mesh is laid out so the ``data`` axis maps onto ICI within a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the canonical (data, model) mesh.

    ``n_data`` defaults to ``len(devices) // n_model``. Device order is taken
    from `jax.devices()` which on TPU already follows the physical torus, so
    contiguous ``data`` groups ride ICI.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if n_data is None:
        if len(devices) % n_model:
            raise ValueError(
                f"device count {len(devices)} not divisible by n_model={n_model}"
            )
        n_data = len(devices) // n_model
    n = n_data * n_model
    if n > len(devices):
        raise ValueError(
            f"requested {n_data}x{n_model} mesh but only {len(devices)} devices"
        )
    grid = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over ``data``; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def model_sharding(mesh: Mesh, axis: int, ndim: int) -> NamedSharding:
    """Shard dimension ``axis`` of an ``ndim`` array over ``model``."""
    spec = [None] * ndim
    spec[axis] = MODEL_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch (pytree of arrays) sharded over the data axis."""

    def put(x):
        return jax.device_put(x, batch_sharding(mesh, max(x.ndim, 1)))

    return jax.tree_util.tree_map(put, batch)


def local_mesh_size(mesh: Mesh) -> int:
    return int(np.prod(list(mesh.shape.values())))
