import jax
import jax.numpy as jnp
import numpy as np

from hairci.parallel import batch_sharding, create_mesh, replicated_sharding
from hairci.ssl import build_recipe


def _tiny_recipe():
    from hairci.aug.pipelines import simclr_transform

    return build_recipe(
        "simclr", backbone="resnet18", img_size=32,
        transform=simclr_transform(32), dtype=jnp.float32,
    )


def test_simclr_train_step_decreases_loss():
    recipe = _tiny_recipe()
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (8, 48, 48, 3), dtype=np.uint8))
    state = recipe.create_state(jax.random.key(0), images)
    step = jax.jit(recipe.train_step)
    losses = []
    for i in range(3):
        state, metrics = step(state, {"image": images}, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 3
    assert all(np.isfinite(losses))


def test_simclr_extract_features_shape():
    recipe = _tiny_recipe()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (4, 48, 48, 3), dtype=np.uint8))
    state = recipe.create_state(jax.random.key(0), images)
    feats = recipe.extract_features(state, images)
    assert feats.shape == (4, 512)


def test_s2r2_mode_trains():
    """`--mode S2R2` = SimCLR + Smooth-AP regularizer. The reference lists
    the mode but crashes on it (mainpretrain.py:61 vs :147-171, no model
    branch); hairci wires it — see PARITY.md deviations."""
    from hairci.aug.pipelines import simclr_transform
    from hairci.cli.mainpretrain import build_recipe_from_args
    from hairci.utils import parse_pretrain_args

    args = parse_pretrain_args(
        ["--mode", "S2R2", "--model", "resnet18", "--size", "32"])
    recipe = build_recipe_from_args(args, num_batches=1)
    assert recipe.s2r2_weight == 1.0
    # a tiny step must run with the regularizer active and stay finite,
    # and differ from the plain-simclr loss on the same batch
    recipe = build_recipe("simclr", backbone="resnet18", img_size=32,
                          transform=simclr_transform(32), dtype=jnp.float32,
                          s2r2_weight=1.0)
    plain = _tiny_recipe()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (8, 48, 48, 3), dtype=np.uint8))
    state = recipe.create_state(jax.random.key(0), images)
    _, m_reg = jax.jit(recipe.train_step)(state, {"image": images},
                                          jax.random.key(1))
    _, m_plain = jax.jit(plain.train_step)(state, {"image": images},
                                           jax.random.key(1))
    assert np.isfinite(float(m_reg["loss"]))
    assert float(m_reg["loss"]) != float(m_plain["loss"])


def test_simclr_train_step_sharded():
    """The step compiles and runs with the batch sharded over an 8-device
    data mesh — global-batch NT-Xent + sync-BN path."""
    mesh = create_mesh()
    recipe = _tiny_recipe()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (16, 48, 48, 3), dtype=np.uint8))
    state = recipe.create_state(jax.random.key(0), images)
    state = jax.device_put(state, replicated_sharding(mesh))
    batch = {"image": jax.device_put(images, batch_sharding(mesh, 4))}
    step = jax.jit(recipe.train_step)
    state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
