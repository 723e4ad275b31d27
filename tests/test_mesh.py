import jax
import jax.numpy as jnp
import numpy as np

from hairci.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    model_sharding,
    replicated_sharding,
    shard_batch,
)


def test_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape[DATA_AXIS] == 8
    assert mesh.shape[MODEL_AXIS] == 1
    mesh2 = create_mesh(n_model=2)
    assert mesh2.shape[DATA_AXIS] == 4
    assert mesh2.shape[MODEL_AXIS] == 2


def test_sharded_batch_matmul():
    mesh = create_mesh()
    x = np.random.default_rng(0).normal(size=(16, 8)).astype(np.float32)
    w = np.random.default_rng(1).normal(size=(8, 4)).astype(np.float32)
    xs = jax.device_put(x, batch_sharding(mesh, 2))
    ws = jax.device_put(w, replicated_sharding(mesh))

    @jax.jit
    def f(a, b):
        return a @ b

    out = f(xs, ws)
    np.testing.assert_allclose(np.asarray(out), x @ w, rtol=1e-5, atol=1e-5)


def test_model_sharded_classifier():
    """Class-sharded margin-head weight: the TP layout for the 93k-class
    face heads."""
    mesh = create_mesh(n_data=4, n_model=2)
    w = np.random.default_rng(0).normal(size=(16, 8)).astype(np.float32)  # (C, D)
    x = np.random.default_rng(1).normal(size=(4, 8)).astype(np.float32)
    ws = jax.device_put(w, model_sharding(mesh, axis=0, ndim=2))
    xs = jax.device_put(x, batch_sharding(mesh, 2))

    @jax.jit
    def logits(a, b):
        return jnp.einsum("bd,cd->bc", a, b)

    out = logits(xs, ws)
    np.testing.assert_allclose(np.asarray(out), x @ w.T, rtol=1e-4, atol=1e-4)


def test_shard_batch_pytree():
    mesh = create_mesh()
    batch = {
        "anchor": np.zeros((8, 4, 4, 3), dtype=np.float32),
        "label": np.zeros((8,), dtype=np.int32),
    }
    sharded = shard_batch(batch, mesh)
    assert sharded["anchor"].sharding.spec[0] == DATA_AXIS
