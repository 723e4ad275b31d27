import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hairci.models import build_backbone, build_resnet, build_vit, backbone_feature_dim
from hairci.models.masking import mask_to_ids_keep, random_block_mask, random_token_mask


@pytest.mark.parametrize("name,dim", [("resnet18", 512), ("resnet50", 2048)])
def test_resnet_feature_dim(name, dim):
    model = build_resnet(name)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    feats = model.apply(variables, x, train=False)
    assert feats.shape == (2, dim)
    assert model.num_features == dim
    assert backbone_feature_dim(name) == dim


def test_resnet_cifar_stem():
    model = build_resnet("resnet18", stem="cifar")
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    feats = model.apply(variables, x, train=False)
    assert feats.shape == (2, 512)


def test_resnet_batch_stats_update():
    model = build_resnet("resnet18")
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, train=True)
    _, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in updates


def test_vit_tokens_and_features():
    model = build_vit("vit_tiny_patch16", img_size=64)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    tokens = model.apply(variables, x, train=False)
    assert tokens.shape == (2, 17, 192)  # 16 patches + cls
    feats = model.apply(variables, x, train=False, pool=True)
    assert feats.shape == (2, 192)


def test_vit_masked_encode():
    model = build_vit("vit_tiny_patch16", img_size=64)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    ids_keep, ids_restore, mask = random_token_mask(jax.random.key(1), 2, 16, 0.75)
    assert ids_keep.shape == (2, 4)
    assert mask.shape == (2, 16)
    np.testing.assert_allclose(np.asarray(mask.sum(axis=1)), [12.0, 12.0])
    tokens = model.apply(variables, x, ids_keep=ids_keep, train=False)
    assert tokens.shape == (2, 5, 192)  # 4 kept + cls


def test_block_mask_ratio():
    mask = random_block_mask(jax.random.key(0), 4, grid=14, mask_ratio=0.5,
                             block=2)
    frac = np.asarray(mask).mean(axis=1)
    assert np.all(frac > 0.3) and np.all(frac < 0.7)
    ids = mask_to_ids_keep(jnp.asarray(mask), num_keep=90)
    assert ids.shape == (4, 90)


def test_vit_global_pool_variant():
    model = build_vit("vit_tiny_patch16", img_size=64, global_pool=True)
    x = jax.random.normal(jax.random.key(0), (2, 64, 64, 3))
    variables = model.init(jax.random.key(1), x, train=False)
    feats = model.apply(variables, x, train=False, pool=True)
    assert feats.shape == (2, 192)
    assert np.isfinite(np.asarray(feats)).all()


def test_resnet_zero_init_residual_gamma():
    """Documented deviation (PARITY.md): each residual block's LAST BN
    scale starts at zero (models/resnet.py scale_init=zeros) — the init
    that BENCH_RESULTS' trained-parity factorial shows dominates
    small-scale trainability. Guard it against silent regression."""
    from hairci.models.resnet import build_resnet

    model = build_resnet("resnet18", dtype=jnp.float32)
    v = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
    block = v["params"]["BasicBlock_0"]
    last_bn = block["BatchNorm_1"]
    assert np.all(np.asarray(last_bn["scale"]) == 0.0)
    assert np.all(np.asarray(block["BatchNorm_0"]["scale"]) == 1.0)
