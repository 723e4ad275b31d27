import os

import numpy as np
import pytest

from hairci.eval.linear_probe import linear_probe_fit_predict
from hairci.eval.umap_export import pca_2d
from hairci.eval.variance import compute_intra_inter_variance


def _blobs(rng, n_per=40, d=16, c=4, spread=0.3, centers=None):
    if centers is None:
        centers = np.random.default_rng(123).normal(size=(c, d)) * 3
    X, y = [], []
    for i in range(c):
        X.append(centers[i] + spread * rng.normal(size=(n_per, d)))
        y.append(np.full(n_per, i))
    X = np.concatenate(X).astype(np.float32)
    y = np.concatenate(y)
    return X, y


def test_linear_probe_jax_matches_sklearn(rng):
    Xtr, ytr = _blobs(rng)
    Xte, yte = _blobs(rng, n_per=10)
    p_jax = linear_probe_fit_predict(Xtr, ytr, Xte, backend="jax")
    p_sk = linear_probe_fit_predict(Xtr, ytr, Xte, backend="sklearn")
    acc_jax = np.mean(p_jax == yte)
    acc_sk = np.mean(p_sk == yte)
    assert acc_jax >= 0.95 and acc_sk >= 0.95
    assert np.mean(p_jax == p_sk) >= 0.95


def test_variance_separated_vs_collapsed(rng):
    X, y = _blobs(rng, spread=0.1)
    tight = compute_intra_inter_variance(X, y)
    X2, y2 = _blobs(rng, spread=3.0)
    loose = compute_intra_inter_variance(X2, y2)
    assert tight["variance_ratio"] > loose["variance_ratio"]
    # hand-computed 1-D case
    f = np.array([[0.0], [2.0], [10.0], [12.0]])
    l = np.array([0, 0, 1, 1])
    r = compute_intra_inter_variance(f, l)
    assert r["intra_class_variance"] == pytest.approx(1.0)
    assert r["inter_class_variance"] == pytest.approx(25.0)


def test_pca_2d_shape(rng):
    X, _ = _blobs(rng)
    coords = pca_2d(X)
    assert coords.shape == (X.shape[0], 2)
    # first component captures more variance
    assert coords[:, 0].var() >= coords[:, 1].var()


def test_classifier_facade(tmp_path, rng):
    from hairci.eval.classifier import Classifier

    Xtr, ytr = _blobs(rng, n_per=20, d=8)
    Xte, yte = _blobs(rng, n_per=5, d=8)

    # fake "loader" of (images, labels) where images are just features
    def loader(X, y, bs=16):
        return [(X[i:i + bs], y[i:i + bs]) for i in range(0, len(X), bs)]

    clf = Classifier(lambda x: x, loader(Xtr, ytr), loader(Xte, yte),
                     str(tmp_path), batch_size=16)
    res = clf.knn_eval(ks=(5, 10))
    assert os.path.exists(tmp_path / "knn_evaluation_results.txt")
    assert res[5] > 0.9
    acc = clf.linear_probe_eval()
    assert os.path.exists(tmp_path / "linear_probe_results.txt")
    assert acc > 0.9
    var = clf.compute_intra_inter_variance("both")
    assert os.path.exists(tmp_path / "variance_analysis_both.txt")
    assert var["variance_ratio"] > 0
    out = clf.save_umap("test")
    assert os.path.exists(out.replace(".png", ".npz"))
