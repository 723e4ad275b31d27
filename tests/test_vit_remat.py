"""Rematerialization must be semantically invisible.

`VisionTransformer.remat` trades memory for recompute four ways (False /
"selective" / True / "half", models/vit.py); none may change the function
computed. These tests pin forward outputs and parameter gradients across
all modes, in f32 (exact graphs) and bf16 (the scores-in-bf16 training
config), on a tiny ViT so the CPU suite stays fast.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hairci.models.vit import VisionTransformer

MODES = [False, "selective", True, "half"]


def _tiny(remat, dtype):
    return VisionTransformer(patch_size=8, embed_dim=64, depth=2,
                             num_heads=4, img_size=32, dtype=dtype,
                             remat=remat)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_remat_modes_agree(dtype):
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 32, 32, 3)), jnp.float32)
    params = _tiny(False, dtype).init(jax.random.key(0), x)["params"]

    outs, grads = [], []
    for mode in MODES:
        model = _tiny(mode, dtype)

        def loss(p):
            feats = model.apply({"params": p}, x, train=True, pool=True)
            return jnp.sum(feats.astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss)(params)
        outs.append(float(l))
        grads.append(g)

    # identical math, identical graphs modulo recompute: bitwise-level match
    for i, mode in enumerate(MODES[1:], start=1):
        assert outs[i] == pytest.approx(outs[0], rel=1e-6), mode
        flat0 = jax.tree_util.tree_leaves(grads[0])
        flati = jax.tree_util.tree_leaves(grads[i])
        for a, b in zip(flat0, flati):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=2e-5, atol=2e-6,
                                       err_msg=f"remat={mode}")


def test_selective_policy_names_exist():
    """The selective policy keys on checkpoint_name tags inside Attention;
    renaming those silently degrades selective remat to save-everything.
    Trace the forward and assert both tags appear."""
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    model = _tiny(False, jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]
    jaxpr = jax.make_jaxpr(
        lambda p: model.apply({"params": p}, x, train=False, pool=True))(
            params)
    s = str(jaxpr)
    assert "attn_scores" in s and "attn_probs" in s
