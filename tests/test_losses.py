import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hairci.losses import (
    bidirectional_margin_loss,
    margin_violation_stats,
    mse_alignment_loss,
    nt_xent_1anchor_2positive,
    nt_xent_loss,
    positive_consistency_loss_margin,
    supcon_loss,
    triplet_margin_loss,
)


def test_ntxent_identical_views_low_loss():
    rng = np.random.default_rng(0)
    z = rng.normal(size=(8, 16)).astype(np.float32)
    same = float(nt_xent_loss(jnp.asarray(z), jnp.asarray(z), 0.1))
    other = float(nt_xent_loss(jnp.asarray(z),
                               jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)),
                               0.1))
    assert same < other


def test_ntxent_closed_form_b1():
    """B=1: two views, each row has exactly one other sample (the positive),
    so loss must be exactly 0 (log_softmax over a single finite entry)."""
    z0 = jnp.asarray([[1.0, 0.0]])
    z1 = jnp.asarray([[0.0, 1.0]])
    assert abs(float(nt_xent_loss(z0, z1, 0.5))) < 1e-5


def test_ntxent_matches_manual_b2():
    rng = np.random.default_rng(1)
    z0 = rng.normal(size=(2, 4)).astype(np.float32)
    z1 = rng.normal(size=(2, 4)).astype(np.float32)
    t = 0.5
    n0 = z0 / np.linalg.norm(z0, axis=1, keepdims=True)
    n1 = z1 / np.linalg.norm(z1, axis=1, keepdims=True)
    z = np.concatenate([n0, n1])
    sim = z @ z.T / t
    np.fill_diagonal(sim, -np.inf)
    ref = 0.0
    for i in range(4):
        j = (i + 2) % 4
        ref += -(sim[i, j] - math.log(np.exp(sim[i]).sum()))
    ref /= 4
    ours = float(nt_xent_loss(jnp.asarray(z0), jnp.asarray(z1), t))
    assert abs(ours - ref) < 1e-4


def test_triplet_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    a = rng.normal(size=(8, 16)).astype(np.float32)
    p = rng.normal(size=(8, 16)).astype(np.float32)
    n = rng.normal(size=(8, 16)).astype(np.float32)
    for margin in (0.5, 0.7, 1.0):
        ref = torch.nn.TripletMarginLoss(margin=margin)(
            torch.tensor(a), torch.tensor(p), torch.tensor(n)).item()
        ours = float(triplet_margin_loss(
            jnp.asarray(a), jnp.asarray(p), jnp.asarray(n), margin))
        assert abs(ours - ref) < 1e-5


def test_supcon_reference_formula():
    """SupCon against a direct numpy transcription of Khosla et al. eq. 2."""
    rng = np.random.default_rng(3)
    B, V, D = 6, 2, 8
    f = rng.normal(size=(B, V, D)).astype(np.float32)
    f /= np.linalg.norm(f, axis=-1, keepdims=True)
    labels = np.array([0, 0, 1, 1, 2, 2])
    t = 0.07
    # view-major like torch.cat(torch.unbind(f, 1))
    feats = np.swapaxes(f, 0, 1).reshape(B * V, D)
    lab_all = np.tile(labels, V)
    sim = feats @ feats.T / t
    loss_ref = 0.0
    for i in range(B * V):
        pos = [j for j in range(B * V) if j != i and lab_all[j] == lab_all[i]]
        denom = sum(math.exp(sim[i, j]) for j in range(B * V) if j != i)
        loss_i = -sum(sim[i, j] - math.log(denom) for j in pos) / len(pos)
        loss_ref += loss_i
    loss_ref /= B * V
    ours = float(supcon_loss(jnp.asarray(f), jnp.asarray(labels), t, t))
    assert abs(ours - loss_ref) < 1e-3


def test_supcon_unsupervised_reduces_to_simclr_positives():
    rng = np.random.default_rng(4)
    f = rng.normal(size=(4, 2, 8)).astype(np.float32)
    f /= np.linalg.norm(f, axis=-1, keepdims=True)
    out = float(supcon_loss(jnp.asarray(f), None))
    assert np.isfinite(out) and out > 0


def test_consistency_and_margin_losses():
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    # identical pairs → zero hinge
    assert float(positive_consistency_loss_margin(a, a, 0.3)) == 0.0
    assert float(mse_alignment_loss(a, a)) < 1e-10
    b = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    assert float(bidirectional_margin_loss(a, a, b)) >= 0.0


def test_margin_violation_stats():
    a = jnp.asarray([[0.0, 0.0]])
    p = jnp.asarray([[3.0, 0.0]])   # pos dist 3
    n = jnp.asarray([[1.0, 0.0]])   # neg dist 1 → violation at any margin>0
    dp, dn, viol = margin_violation_stats(a, p, n, 0.5)
    assert float(dp) == 3.0 and float(dn) == 1.0 and int(viol) == 1


def test_ntxent_two_positive():
    rng = np.random.default_rng(6)
    a = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    out = float(nt_xent_1anchor_2positive(a, a, a, 0.5))
    rand = float(nt_xent_1anchor_2positive(
        a,
        jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32)),
    ))
    assert out < rand


def test_losses_differentiable():
    rng = np.random.default_rng(7)
    z0 = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    z1 = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    g = jax.grad(lambda a: nt_xent_loss(a, z1, 0.5))(z0)
    assert np.isfinite(np.asarray(g)).all()
