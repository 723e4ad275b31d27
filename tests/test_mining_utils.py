import jax.numpy as jnp
import numpy as np
import pytest

from hairci.parallel.collectives import shard_for_host
from hairci.train.mining import estimate_k_by_pca, mine_hard_negatives, run_kmeans
from hairci.utils.metrics import (
    MetricLogger,
    SmoothedValue,
    label_smoothing_cross_entropy,
)


def _clusters(rng, k=4, n_per=50, d=8):
    centers = rng.normal(size=(k, d)) * 5
    X = np.concatenate([centers[i] + 0.2 * rng.normal(size=(n_per, d))
                        for i in range(k)]).astype(np.float32)
    return X, centers


def test_kmeans_recovers_clusters(rng):
    X, centers = _clusters(rng)
    cents, assign = run_kmeans(X, k=4, niter=20)
    cents = np.asarray(cents)
    assign = np.asarray(assign)
    # each true cluster maps to one kmeans cluster coherently
    for i in range(4):
        block = assign[i * 50:(i + 1) * 50]
        dominant = np.bincount(block).max()
        assert dominant >= 45
    # centroids close to true centers (up to permutation)
    d = np.linalg.norm(cents[:, None] - centers[None], axis=2)
    assert d.min(axis=0).max() < 1.0


def test_estimate_k_by_pca(rng):
    # data with ~3 strong directions
    basis = rng.normal(size=(3, 16))
    X = rng.normal(size=(200, 3)) @ basis + 0.01 * rng.normal(size=(200, 16))
    k, m_star = estimate_k_by_pca(jnp.asarray(X, jnp.float32))
    assert m_star <= 4
    assert 5 <= k <= 199


def test_mine_hard_negatives_no_self(rng):
    X, _ = _clusters(rng)
    cents, _ = run_kmeans(X, k=4, niter=10)
    hard = np.asarray(mine_hard_negatives(X, cents, seed=0))
    assert hard.shape == (200,)
    assert not np.any(hard == np.arange(200))
    # hard negatives come from a DIFFERENT cluster than the anchor
    anchor_cluster = np.repeat(np.arange(4), 50)
    frac_diff = np.mean(anchor_cluster[hard] != anchor_cluster)
    assert frac_diff > 0.9


def test_shard_for_host():
    s0 = shard_for_host(10, 0, 3)
    s1 = shard_for_host(10, 1, 3)
    s2 = shard_for_host(10, 2, 3)
    assert np.concatenate([s0, s1, s2]).tolist() == list(range(10))


def test_smoothed_value_and_logger():
    v = SmoothedValue(window_size=3)
    for x in [1.0, 2.0, 3.0, 4.0]:
        v.update(x)
    assert v.value == 4.0
    assert v.avg == pytest.approx(3.0)       # window [2,3,4]
    assert v.global_avg == pytest.approx(2.5)
    logger = MetricLogger()
    logger.update(loss=1.0, acc=0.5)
    logger.update(loss=3.0, acc=0.7)
    assert logger.loss.global_avg == pytest.approx(2.0)
    assert "loss" in str(logger)


def test_label_smoothing_ce():
    logits = jnp.asarray([[10.0, -10.0], [-10.0, 10.0]])
    labels = jnp.asarray([0, 1])
    sharp = float(label_smoothing_cross_entropy(logits, labels, 0.0))
    smooth = float(label_smoothing_cross_entropy(logits, labels, 0.1))
    assert sharp < 0.01
    assert smooth > sharp
