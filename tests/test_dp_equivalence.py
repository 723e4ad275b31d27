"""Sharded-vs-single-device equivalence: the multi-chip *correctness* proof
behind docs/SCALING.md's global-batch claim.

The reference reaches data parallelism through DDP + `GatherLayer`
(`/root/reference/src/util/misc.py:519-536`) — gradients all-reduced, the
global similarity matrix assembled by an explicit all-gather. hairci instead
shards the batch over the mesh's ``data`` axis and lets XLA insert the
collectives. These tests assert the two placements of the SAME jitted step —
batch on one device vs sharded over 8 — produce the same loss and the same
parameter update to numerical tolerance (reduction orders differ across
layouts, so exact bitwise equality is not expected).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hairci.parallel import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
)
from hairci.ssl import build_recipe

B = 16


def _images():
    rng = np.random.default_rng(3)
    return jnp.asarray(rng.integers(0, 256, (B, 48, 48, 3), dtype=np.uint8))


def _tree_l2(a, b=None):
    # pull to host first: the trees live on different device sets
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(a)]
    if b is None:
        sq = sum(float(np.vdot(x, x).real) for x in leaves)
    else:
        lb = [np.asarray(y) for y in jax.tree_util.tree_leaves(b)]
        sq = sum(float(np.vdot(x - y, x - y).real)
                 for x, y in zip(leaves, lb))
    return float(np.sqrt(sq))


def _run(recipe, state, images, placement, **step_kw):
    """placement: 'single' (everything on device 0) or 'sharded'."""
    static = {k for k in step_kw if isinstance(step_kw[k], (str, bool))}
    step = jax.jit(recipe.train_step,
                   static_argnames=tuple(static) if static else ())
    if placement == "single":
        dev = jax.devices()[0]
        state = jax.device_put(state, dev)
        batch = {"image": jax.device_put(images, dev)}
    else:
        mesh = create_mesh(n_data=8, n_model=1)
        state = jax.device_put(state, replicated_sharding(mesh))
        batch = {"image": jax.device_put(images, batch_sharding(mesh, 4))}
    new_state, metrics = step(state, batch, jax.random.key(7), **step_kw)
    return new_state, float(metrics["loss"])


@pytest.mark.parametrize("name,kwargs,step_kw", [
    ("simclr", {}, {}),
    ("SHAM", {"num_batches": 2, "warm_up_epochs": 2},
     {"stage": "warmup", "batch_id": 0, "k": 3}),
])
def test_dp_step_matches_single_device(name, kwargs, step_kw):
    assert len(jax.devices()) >= 8, "conftest must force the 8-device mesh"
    from hairci.aug.pipelines import simclr_transform

    recipe = build_recipe(name, backbone="resnet18", img_size=32,
                          transform=simclr_transform(32), dtype=jnp.float32,
                          **kwargs)
    state = recipe.create_state(jax.random.key(0), _images())

    s1, loss1 = _run(recipe, state, _images(), "single", **step_kw)
    s8, loss8 = _run(recipe, state, _images(), "sharded", **step_kw)

    np.testing.assert_allclose(loss1, loss8, rtol=2e-4, atol=1e-5)
    # the parameter UPDATE (after - before) isolates the gradient step
    d1 = _tree_l2(s1.params, state.params)
    d8 = _tree_l2(s8.params, state.params)
    np.testing.assert_allclose(d1, d8, rtol=1e-3)
    # and the trees agree leaf-wise, not just in norm
    diff = _tree_l2(s1.params, s8.params)
    assert diff <= 1e-3 * max(d1, 1e-8), f"param trees diverged: {diff}"
