"""Smoke tests: every SSL recipe builds, runs one jitted train step with
finite loss, and extracts features of the right shape."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hairci.aug import pipelines
from hairci.ssl import RECIPES, build_recipe

IMG = 32  # tiny: ViT grid 2x2


def _images(b=4, s=48):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.integers(0, 256, (b, s, s, 3), dtype=np.uint8))


def _run_steps(recipe, batch, n=1, **step_kw):
    state = recipe.create_state(jax.random.key(0), batch["image"])
    step = jax.jit(recipe.train_step)
    for i in range(n):
        state, metrics = step(state, batch, jax.random.key(i), **step_kw)
    return state, metrics


def test_registry_covers_reference_modes():
    assert {"simclr", "SHAM", "mae", "simMIM", "BYOL", "DenseCL", "MSN",
            "dinov2", "simclr_supcon", "siameseim"} <= set(RECIPES)


def test_mae_recipe():
    r = build_recipe("mae", backbone="vit_tiny_patch16", img_size=IMG,
                     transform=pipelines.mae_transform(IMG),
                     dtype=jnp.float32)
    state, m = _run_steps(r, {"image": _images()})
    assert np.isfinite(float(m["loss"]))
    f = r.extract_features(state, _images())
    assert f.shape == (4, 192)


def test_simmim_recipe():
    r = build_recipe("simMIM", backbone="vit_tiny_patch16", img_size=IMG,
                     transform=pipelines.simmim_transform(IMG),
                     dtype=jnp.float32)
    state, m = _run_steps(r, {"image": _images()})
    assert np.isfinite(float(m["loss"]))
    assert r.extract_features(state, _images()).shape == (4, 192)


def test_byol_recipe():
    t = pipelines.byol_transform(IMG)
    t = dataclasses.replace(
        t, views=tuple(dataclasses.replace(v, blur_p=0.0) for v in t.views))
    r = build_recipe("BYOL", backbone="resnet18", img_size=IMG, transform=t,
                     dtype=jnp.float32)
    state, m = _run_steps(r, {"image": _images()}, momentum=0.99)
    assert np.isfinite(float(m["loss"]))
    assert -1.1 < float(m["loss"]) < 1.0
    assert r.extract_features(state, _images()).shape == (4, 512)
    assert 0.996 <= r.momentum_for_epoch(50) <= 1.0


def test_densecl_recipe():
    r = build_recipe("DenseCL", backbone="resnet18", img_size=IMG,
                     transform=pipelines.densecl_transform(IMG),
                     bank_size=64, dtype=jnp.float32)
    state, m = _run_steps(r, {"image": _images()}, n=2, momentum=0.99)
    assert np.isfinite(float(m["loss"]))
    assert {"global_loss", "local_loss"} <= set(m)
    # bank advanced: 2 steps x 4 keys
    assert int(state.extra["ptr_g"]) == 8
    assert r.extract_features(state, _images()).shape == (4, 512)


def test_msn_recipe():
    t = pipelines.msn_transform(IMG, focal_size=16, n_focal=2)
    r = build_recipe("MSN", backbone="vit_tiny_patch16", img_size=IMG,
                     focal_size=16, n_focal=2, transform=t,
                     dtype=jnp.float32)
    state, m = _run_steps(r, {"image": _images()})
    assert np.isfinite(float(m["loss"]))
    assert r.extract_features(state, _images()).shape == (4, 192)


def test_dinov2_recipe():
    t = pipelines.dino_transform(IMG, local_size=16, n_local=2)
    r = build_recipe("dinov2", backbone="vit_tiny_patch16", img_size=IMG,
                     local_size=16, n_local=2, head_out=64, transform=t,
                     dtype=jnp.float32)
    state, m = _run_steps(r, {"image": _images()}, teacher_temp=0.04,
                          momentum=0.99)
    assert np.isfinite(float(m["loss"]))
    for key in ("dino_loss", "ibot_loss", "koleo_loss"):
        assert np.isfinite(float(m[key]))
    # centers updated away from zero
    assert float(jnp.abs(state.extra["dino_center"]).sum()) > 0
    assert r.extract_features(state, _images()).shape == (4, 192)
    # schedules
    assert r.teacher_temp(0) == pytest.approx(0.04)
    assert r.momentum(r.epochs * r.steps_per_epoch) == pytest.approx(1.0)


def test_supcon_recipe():
    r = build_recipe("simclr_supcon", backbone="resnet18", img_size=IMG,
                     transform=pipelines.supcon_train_transform(IMG),
                     dtype=jnp.float32)
    labels = jnp.asarray([0, 0, 1, 1])
    state, m = _run_steps(r, {"image": _images(), "label": labels})
    assert np.isfinite(float(m["loss"]))
    assert r.extract_features(state, _images()).shape == (4, 512)


def test_siameseim_recipe():
    r = build_recipe("siameseim", backbone="vit_tiny_patch16", img_size=IMG,
                     dtype=jnp.float32, decoder_dim=64, decoder_num_heads=4)
    state, m = _run_steps(r, {"image": _images()}, momentum=0.99)
    assert np.isfinite(float(m["loss"]))
    assert r.extract_features(state, _images()).shape == (4, 192)
    # reference structure: online projector params exist and the predictor's
    # pred is at decoder width (backbone.py:1584-1612)
    assert "decoder_embed" in state.params
    assert "projector_blocks_0" in state.params
    assert "decoder_pos_mlp" in state.params


def test_siameseim_ema_tracks_trained_projector():
    """The momentum target must be the EMA of the GRADIENT-TRAINED online
    projector (`mm_decoder_embed`/`mm_projector_decoder_blocks`, reference
    `mm_update` backbone.py:1461-1490) — not a frozen random projection:
    after steps the EMA projector params are strictly closer to the trained
    online params than the shared init was."""
    r = build_recipe("siameseim", backbone="vit_tiny_patch16", img_size=IMG,
                     dtype=jnp.float32, decoder_dim=64, decoder_num_heads=4,
                     learning_rate=1e-2)
    batch = {"image": _images()}
    state = r.create_state(jax.random.key(0), batch["image"])

    def proj(tree):
        return np.concatenate([
            np.asarray(tree["decoder_embed"]["kernel"]).ravel(),
            np.asarray(
                tree["projector_blocks_0"]["attn"]["qkv"]["kernel"]).ravel(),
        ])

    init = proj(state.params)
    np.testing.assert_allclose(proj(state.ema_params), init)  # exact copy
    step = jax.jit(r.train_step)
    for i in range(5):
        state, _ = step(state, batch, jax.random.key(i), momentum=0.5)
    online = proj(state.params)
    d_online = np.linalg.norm(online - init)
    assert d_online > 1e-6  # the projector IS on the gradient path
    d_ema = np.linalg.norm(proj(state.ema_params) - online)
    assert d_ema < np.linalg.norm(init - online)


def test_siameseim_relative_pos_identity():
    """Same crop for source and target → patch coords equal the plain grid."""
    from hairci.ssl.siameseim import relative_pos_embed

    boxes = jnp.asarray([[0.0, 0.0, 64.0, 64.0]])
    rel_same = relative_pos_embed(boxes, boxes, grid=4, dim=64)
    assert rel_same.shape == (1, 16, 64)
    # a shifted target crop yields different embeddings
    shifted = jnp.asarray([[32.0, 0.0, 64.0, 64.0]])
    rel_shift = relative_pos_embed(boxes, shifted, grid=4, dim=64)
    assert not np.allclose(np.asarray(rel_same), np.asarray(rel_shift))


@pytest.mark.parametrize("mode", ["embedding", "reconstruction"])
def test_sham_v1_recipe(mode):
    r = build_recipe("SHAM_v1", backbone="vit_tiny_patch16", img_size=IMG,
                     sham_mode=mode, transform=pipelines.simclr_transform(IMG),
                     dtype=jnp.float32)
    state, m = _run_steps(r, {"image": _images()})
    assert np.isfinite(float(m["loss"]))
    assert {"global_loss", "local_loss"} <= set(m)
    if mode == "reconstruction":
        assert "recon_loss" in m
    assert r.extract_features(state, _images()).shape == (4, 192)
