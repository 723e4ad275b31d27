import numpy as np
import pytest

from hairci.eval import knn_eval, knn_predict
from hairci.eval.features import l2_normalize

sklearn = pytest.importorskip("sklearn")
from sklearn.neighbors import KNeighborsClassifier


def _data(rng, n_train=300, n_test=80, d=32, c=7):
    train = rng.normal(size=(n_train, d)).astype(np.float32)
    test = rng.normal(size=(n_test, d)).astype(np.float32)
    train /= np.linalg.norm(train, axis=1, keepdims=True)
    test /= np.linalg.norm(test, axis=1, keepdims=True)
    ytr = rng.integers(0, c, n_train)
    yte = rng.integers(0, c, n_test)
    return train, ytr, test, yte


@pytest.mark.parametrize("k", [1, 5, 20])
def test_knn_matches_sklearn(rng, k):
    train, ytr, test, yte = _data(rng)
    ours = knn_predict(train, ytr, test, k, num_classes=7)
    ref = (
        KNeighborsClassifier(n_neighbors=k, metric="cosine")
        .fit(train, ytr)
        .predict(test)
    )
    # tie-breaking can differ on exact vote ties; require ≥99% agreement and
    # identical accuracy to within one sample
    agree = np.mean(ours == ref)
    assert agree >= 0.95, f"agreement {agree} at k={k}"
    acc_ours = np.mean(ours == yte)
    acc_ref = np.mean(ref == yte)
    assert abs(acc_ours - acc_ref) <= 2.0 / len(yte)


def test_knn_eval_keys(rng):
    train, ytr, test, yte = _data(rng, n_train=100, n_test=20)
    res = knn_eval(train, ytr, test, yte, ks=(5, 10))
    assert set(res) == {5, 10}
    for r in res.values():
        assert 0.0 <= r["accuracy"] <= 1.0
        assert r["confusion_matrix"].sum() == 20


def test_knn_k_larger_than_gallery(rng):
    train, ytr, test, yte = _data(rng, n_train=10, n_test=5)
    preds = knn_predict(train, ytr, test, k=642, num_classes=7)
    assert preds.shape == (5,)


def test_l2_normalize_zero_safe():
    import jax.numpy as jnp

    x = jnp.zeros((2, 4))
    out = np.asarray(l2_normalize(x))
    assert np.isfinite(out).all()


def test_knn_multi_matches_per_k(rng):
    """The shared sims+top_k(kmax) prefix-vote path must be bitwise-identical
    to the per-k kernel for every k (incl. duplicate-row ties and ks that
    clip to the gallery size)."""
    from hairci.eval import knn_predict_multi

    train, ytr, test, yte = _data(rng, n_train=120, n_test=64)
    # inject exact duplicate gallery rows with different labels: real
    # similarity ties, so index-stable tie-breaking is exercised
    train[10] = train[50] = train[90]
    ytr[10], ytr[50], ytr[90] = 0, 3, 6
    ks = (1, 5, 20, 27, 642)  # 642 clips to n_train=120
    multi = knn_predict_multi(train, ytr, test, ks, num_classes=7)
    assert set(multi) == set(ks)
    for k in ks:
        single = knn_predict(train, ytr, test, k, num_classes=7)
        np.testing.assert_array_equal(multi[k], single, err_msg=f"k={k}")


def test_knn_multi_chunked_consistent(rng):
    from hairci.eval import knn_predict_multi

    train, ytr, test, yte = _data(rng, n_train=90, n_test=33)
    a = knn_predict_multi(train, ytr, test, (5, 10), num_classes=7, chunk=8)
    b = knn_predict_multi(train, ytr, test, (5, 10), num_classes=7, chunk=4096)
    for k in (5, 10):
        np.testing.assert_array_equal(a[k], b[k])
