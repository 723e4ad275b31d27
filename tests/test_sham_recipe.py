import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hairci.ssl import build_recipe
from hairci.ssl.sham import derangement, kth_neighbor_indices


def _tiny_recipe(**kw):
    from hairci.aug.pipelines import simclr_transform

    defaults = dict(
        backbone="resnet18", img_size=32, transform=simclr_transform(32),
        dtype=jnp.float32, num_batches=2, warm_up_epochs=2,
    )
    defaults.update(kw)
    return build_recipe("SHAM", **defaults)


def test_derangement_no_self_pairs():
    for seed in range(5):
        idx = np.asarray(derangement(jax.random.key(seed), 16))
        assert not np.any(idx == np.arange(16))
        # near-permutation (the reference's +1 self-fix can duplicate too,
        # `neg_sampling.py:18-21`)
        assert len(set(idx.tolist())) >= 12
        assert idx.min() >= 0 and idx.max() < 16


def test_kth_neighbor_indices():
    # 4 points on a line in embedding space; k=2 → most similar non-self
    f = jnp.asarray([[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.1, 0.9]])
    idx = np.asarray(kth_neighbor_indices(f, jnp.asarray(2)))
    # k=1 is self (sim=1); k=2 is nearest other
    assert idx[0] == 1 and idx[1] == 0 and idx[2] == 3 and idx[3] == 2


def test_sham_stage_schedule():
    r = _tiny_recipe(warm_up_epochs=3)
    assert r.stage_for_epoch(0) == "warmup"
    assert r.stage_for_epoch(1) == "warmup"
    assert r.stage_for_epoch(2) == "mine"   # epoch+1 == warm_up
    assert r.stage_for_epoch(3) == "mined"
    assert _tiny_recipe(ablation="randomly").stage_for_epoch(10) == "warmup"


def test_adapt_k():
    r = _tiny_recipe()
    assert r.adapt_k(0.0, 100) == 10     # no violations → k=10
    assert r.adapt_k(100.0, 100) == 2    # all violations → k floors at 2
    assert r.adapt_k(50.0, 100) == 5


def test_sham_full_staged_training():
    recipe = _tiny_recipe()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (8, 48, 48, 3), dtype=np.uint8))
    state = recipe.create_state(jax.random.key(0), images)

    import functools

    step = jax.jit(recipe.train_step, static_argnames="stage")

    # warm-up epoch
    state, m = step(state, {"image": images}, jax.random.key(1),
                    stage="warmup", batch_id=0)
    assert np.isfinite(float(m["loss"]))
    assert {"contrastive_loss", "triplet_loss", "mse_loss",
            "margin_violations"} <= set(m)
    # mining epoch: indices get written into state
    before = np.asarray(state.neg_indices).copy()
    state, m = step(state, {"image": images}, jax.random.key(2),
                    stage="mine", batch_id=1, k=3)
    after = np.asarray(state.neg_indices)
    assert not np.array_equal(before[1], after[1])
    np.testing.assert_array_equal(before[0], after[0])
    # mined epoch: reuse cached indices
    state, m = step(state, {"image": images}, jax.random.key(3),
                    stage="mined", batch_id=1)
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 3


def test_sham_ema_moves_towards_online():
    recipe = _tiny_recipe(ema_momentum=0.5)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (8, 48, 48, 3), dtype=np.uint8))
    state = recipe.create_state(jax.random.key(0), images)
    step = jax.jit(recipe.train_step, static_argnames="stage")
    s1, _ = step(state, {"image": images}, jax.random.key(1), stage="warmup")
    # after one step, online params changed; EMA equals old params (first EMA
    # update happens before grads: ema = ema*0.5 + online*0.5 = params)
    def max_diff(t0, t1):
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), t0, t1)
        return max(jax.tree_util.tree_leaves(diffs))

    assert max_diff(state.params, s1.params) > 1e-6  # online moved
    assert max_diff(s1.ema_params, state.params) < 1e-6  # ema == old params


@pytest.mark.parametrize("ablation", ["No_Triplet", "No_MSE", "randomly",
                                      "No_pos_transform",
                                      "No masked positive"])
def test_sham_ablations_run(ablation):
    recipe = _tiny_recipe(ablation=ablation)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (4, 48, 48, 3), dtype=np.uint8))
    state = recipe.create_state(jax.random.key(0), images)
    step = jax.jit(recipe.train_step, static_argnames="stage")
    _, m = step(state, {"image": images}, jax.random.key(1), stage="warmup")
    assert np.isfinite(float(m["loss"]))


def test_sham_extract_features():
    recipe = _tiny_recipe()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (4, 48, 48, 3), dtype=np.uint8))
    state = recipe.create_state(jax.random.key(0), images)
    f = recipe.extract_features(state, images)
    fe = recipe.extract_features_ema(state, images)
    assert f.shape == (4, 512) and fe.shape == (4, 512)
    np.testing.assert_allclose(np.asarray(f), np.asarray(fe), atol=1e-5)


def test_sham_s2r2_regularizer():
    recipe = _tiny_recipe(s2r2_weight=1.0)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (4, 48, 48, 3), dtype=np.uint8))
    state = recipe.create_state(jax.random.key(0), images)
    step = jax.jit(recipe.train_step, static_argnames="stage")
    _, m = step(state, {"image": images}, jax.random.key(1), stage="warmup")
    base = _tiny_recipe()
    state2 = base.create_state(jax.random.key(0), images)
    step2 = jax.jit(base.train_step, static_argnames="stage")
    _, m2 = step2(state2, {"image": images}, jax.random.key(1),
                  stage="warmup")
    # same weights+rng → s2r2 adds a nonzero term to the total
    assert float(m["loss"]) != float(m2["loss"])
    assert np.isfinite(float(m["loss"]))
