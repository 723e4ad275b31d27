import jax
import jax.numpy as jnp
import numpy as np

from hairci.losses import (
    dense_loss,
    dino_loss,
    distillation_loss,
    ibot_patch_loss,
    koleo_loss,
    masked_l1_loss,
    masked_mse_loss,
    memory_bank_infonce,
    msn_loss,
    negative_cosine_similarity,
    patch_contrastive_loss,
    patchify,
    s2r2_loss,
    select_most_similar,
    unigrad_loss,
    unpatchify,
    update_memory_bank,
)


def test_negative_cosine_bounds():
    a = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32))
    assert abs(float(negative_cosine_similarity(a, a)) + 1.0) < 1e-5


def test_distillation_zero_for_identical():
    a = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32))
    assert float(distillation_loss(a, a)) < 1e-6


def test_patchify_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32))
    p = patchify(x, 16)
    assert p.shape == (2, 4, 16 * 16 * 3)
    np.testing.assert_allclose(np.asarray(unpatchify(p, 16)), np.asarray(x))


def test_masked_losses_count_only_masked():
    pred = jnp.zeros((2, 4, 8))
    target = jnp.ones((2, 4, 8))
    mask = jnp.asarray([[1, 0, 0, 0], [1, 1, 0, 0]], jnp.float32)
    assert abs(float(masked_mse_loss(pred, target, mask)) - 1.0) < 1e-6
    assert abs(float(masked_l1_loss(pred, target, mask)) - 1.0) < 1e-6
    # unmasked variant = plain mean
    assert abs(float(masked_mse_loss(pred, target)) - 1.0) < 1e-6


def test_dino_loss_center_update():
    rng = np.random.default_rng(0)
    t = tuple(jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
              for _ in range(2))
    s = tuple(jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
              for _ in range(4))
    center = jnp.zeros((1, 16))
    loss, new_center = dino_loss(t, s, center)
    assert np.isfinite(float(loss)) and float(loss) > 0
    expected = 0.1 * np.mean(np.concatenate([np.asarray(x) for x in t]), axis=0)
    np.testing.assert_allclose(np.asarray(new_center)[0], expected, rtol=1e-4,
                               atol=1e-5)


def test_ibot_patch_loss_masked_only():
    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.normal(size=(2, 4, 16)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(2, 4, 16)).astype(np.float32))
    mask = jnp.asarray([[True, False, False, False],
                        [False, False, False, False]])
    center = jnp.zeros((1, 16))
    loss, _ = ibot_patch_loss(t, s, mask, center)
    assert np.isfinite(float(loss))


def test_ibot_chunked_matches_reference_loss():
    """The DINOv2 recipe's streamed masked-token iBOT loss equals
    ibot_patch_loss run on full (B, N, K) logits with the same mask."""
    import jax

    from hairci.ssl import build_recipe

    r = build_recipe("dinov2", backbone="vit_tiny_patch16", img_size=32,
                     dtype=jnp.float32, local_size=16, n_local=2)
    rng = np.random.default_rng(4)
    B, N, D = 6, r.grid * r.grid, r.embed_dim
    tokens_t = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    tokens_s = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, N)) < 0.4)
    # ensure no image exceeds the recipe's static masked-count bound
    mask = mask.at[:, r.n_masked:].set(False)
    center = jnp.asarray(rng.normal(size=(1, r.head_out)).astype(np.float32))
    imgs = jnp.zeros((2, 32, 32, 3), jnp.uint8)
    state = r.create_state(jax.random.key(0), imgs)

    head = lambda params, x: r.module.apply(  # noqa: E731
        {"params": params}, x, method=r.module.patch_logits)
    want, want_center = ibot_patch_loss(
        head(state.ema_params, tokens_t), head(state.params, tokens_s),
        mask, center, teacher_temp=0.05)

    w, idx = jax.lax.top_k(mask.astype(jnp.int32), r.n_masked)
    t_m = jnp.take_along_axis(tokens_t, idx[..., None], axis=1)
    s_m = jnp.take_along_axis(tokens_s, idx[..., None], axis=1)
    got, got_center = r._ibot_loss_chunked(
        state.params, state.ema_params, t_m, s_m, w.astype(jnp.float32),
        center, teacher_temp=0.05)

    np.testing.assert_allclose(float(got), float(want), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(got_center), np.asarray(want_center),
                               rtol=2e-3, atol=2e-4)


def test_koleo_penalizes_collapse():
    rng = np.random.default_rng(2)
    spread = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    collapsed = jnp.ones((8, 16)) + 1e-4 * jnp.asarray(
        rng.normal(size=(8, 16)).astype(np.float32))
    assert float(koleo_loss(collapsed)) > float(koleo_loss(spread))


def test_msn_loss_finite_and_positive():
    rng = np.random.default_rng(3)
    anchors = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    targets = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    protos = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    loss = float(msn_loss(anchors, targets, protos))
    assert np.isfinite(loss)


def test_dense_loss_prefers_matching():
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.normal(size=(2, 4, 8)).astype(np.float32))
    matched = float(dense_loss(a, a))
    other = float(dense_loss(
        a, jnp.asarray(rng.normal(size=(2, 4, 8)).astype(np.float32))))
    assert matched < other


def test_patch_contrastive_matches_per_sample_ntxent():
    from hairci.losses import nt_xent_loss

    rng = np.random.default_rng(5)
    s = jnp.asarray(rng.normal(size=(3, 4, 8)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(3, 4, 8)).astype(np.float32))
    batched = float(patch_contrastive_loss(s, t, 0.5))
    loop = np.mean([float(nt_xent_loss(s[i], t[i], 0.5)) for i in range(3)])
    assert abs(batched - loop) < 1e-4


def test_memory_bank():
    bank = jnp.zeros((8, 4))
    ptr = jnp.zeros((), jnp.int32)
    keys = jnp.ones((3, 4))
    bank, ptr = update_memory_bank(bank, ptr, keys)
    assert int(ptr) == 3
    np.testing.assert_array_equal(np.asarray(bank[:3]), np.ones((3, 4)))
    # wrap-around
    bank, ptr = update_memory_bank(bank, jnp.asarray(6), 2 * keys)
    assert int(ptr) == 1
    np.testing.assert_array_equal(np.asarray(bank[0]), 2 * np.ones(4))
    q = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4)).astype(np.float32))
    loss = float(memory_bank_infonce(q, q, bank))
    assert np.isfinite(loss)


def test_select_most_similar_identity():
    rng = np.random.default_rng(6)
    f = jnp.asarray(rng.normal(size=(2, 4, 8)).astype(np.float32))
    local = jnp.asarray(rng.normal(size=(2, 4, 5)).astype(np.float32))
    out = select_most_similar(f, f, local)
    np.testing.assert_allclose(np.asarray(out), np.asarray(local))


def test_s2r2_perfect_ranking_low_loss():
    # two views of 4 distinct well-separated points
    base = jnp.asarray(np.eye(4, 8, dtype=np.float32))
    emb = jnp.concatenate([base, base + 0.01], axis=0)
    good = float(s2r2_loss(emb, k_views=2))
    rng = np.random.default_rng(7)
    bad = float(s2r2_loss(
        jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32)), k_views=2))
    assert good < bad


def test_unigrad_reference_form():
    """Exact recomputation of `compute_unigrad_loss` (backbone.py:1642-1660):
    teacher standardization (student_norm = Identity at the reference's
    default `online_ln=False`, backbone.py:1289-1295), squared-error pos,
    target-correlation neg, (pos + w*neg)/dim."""
    rng = np.random.default_rng(9)
    p = rng.normal(size=(6, 8)).astype(np.float32)
    t = rng.normal(size=(6, 8)).astype(np.float32)

    def std(x):
        return ((x - x.mean(-1, keepdims=True))
                / np.sqrt(x.var(-1, keepdims=True) + 1e-5))

    ts = std(t)

    def want(ps):
        pos = ((ps - ts) ** 2).sum(-1).mean()
        corr = ts.T @ ts / ts.shape[0]
        neg = np.einsum("bi,ij,bj->b", ps, corr, ps).mean()
        return (pos + 0.02 * neg) / p.shape[-1]

    got = float(unigrad_loss(jnp.asarray(p), jnp.asarray(t), 0.02))
    np.testing.assert_allclose(got, want(p), rtol=1e-5)
    got_ln = float(unigrad_loss(jnp.asarray(p), jnp.asarray(t), 0.02,
                                online_ln=True))
    np.testing.assert_allclose(got_ln, want(std(p)), rtol=1e-5)


def test_unigrad_gradient_flows():
    rng = np.random.default_rng(8)
    z1 = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    z2 = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    g = jax.grad(lambda a: unigrad_loss(a, z2))(z1)
    assert np.isfinite(np.asarray(g)).all()
    assert float(unigrad_loss(z1, z1)) < float(unigrad_loss(z1, z2))
