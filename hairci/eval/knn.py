"""On-device kNN classification — replaces the sklearn
`KNeighborsClassifier(metric="cosine")` loop of the reference
(`/root/reference/HairPretraining/src/classification_engine.py:71-98`).

TPU-first: cosine distance over L2-normalized features is one (Nq, Ng)
matmul on the MXU in f32 accumulation, followed by `lax.top_k` and a one-hot
vote. Tie-breaking parity with sklearn:
  * equal distances → lower gallery index wins (lax.top_k is index-stable),
  * equal vote counts → lower class id wins (argmax returns first maximum).
Large query sets are processed in chunks to bound the score-matrix footprint.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hairci.eval.features import l2_normalize

DEFAULT_KS: Tuple[int, ...] = (5, 10, 20, 27, 30, 40, 642)  # reference :82


@partial(jax.jit, static_argnames=("k", "num_classes"))
def _knn_predict_chunk(
    query: jnp.ndarray,      # (Q, D) normalized
    gallery: jnp.ndarray,    # (N, D) normalized
    labels: jnp.ndarray,     # (N,) int32
    k: int,
    num_classes: int,
) -> jnp.ndarray:
    # Precision.HIGHEST: the reference's sklearn path accumulates this dot
    # in f32 BLAS (max err ~4e-8 at D=2048); TPU default precision is a
    # single bf16 pass (~2e-4), enough to swap k-th/(k+1)-th neighbors whose
    # true gap is ~1e-5 at a 100k gallery and flip tied votes. HIGHEST
    # restores f32-grade accumulation (~1.4e-8 measured) so prediction
    # parity holds at reference scale; the extra matmul passes are noise
    # next to feature extraction in knn_eval wall-clock.
    sims = jnp.einsum("qd,nd->qn", query, gallery,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    _, idx = jax.lax.top_k(sims, k)                      # (Q, k)
    votes = labels[idx]                                  # (Q, k)
    counts = jnp.sum(jax.nn.one_hot(votes, num_classes, dtype=jnp.float32),
                     axis=1)                             # (Q, C)
    return jnp.argmax(counts, axis=1).astype(jnp.int32)


def knn_predict(
    train_features: np.ndarray,
    train_labels: np.ndarray,
    test_features: np.ndarray,
    k: int,
    num_classes: int | None = None,
    chunk: int = 4096,
    normalized: bool = True,
) -> np.ndarray:
    """Predicted labels for every test row (classes are raw int ids)."""
    if num_classes is None:
        num_classes = int(max(train_labels.max(), 0)) + 1
    k = min(k, train_features.shape[0])
    gallery = jnp.asarray(train_features, dtype=jnp.float32)
    labels = jnp.asarray(train_labels, dtype=jnp.int32)
    if not normalized:
        gallery = l2_normalize(gallery)
    preds = []
    for start in range(0, test_features.shape[0], chunk):
        q = jnp.asarray(test_features[start:start + chunk], dtype=jnp.float32)
        if not normalized:
            q = l2_normalize(q)
        preds.append(np.asarray(
            _knn_predict_chunk(q, gallery, labels, k, num_classes)))
    return np.concatenate(preds)


@partial(jax.jit, static_argnames=("ks", "num_classes"))
def _knn_predict_multi_chunk(
    query: jnp.ndarray,      # (Q, D) normalized
    gallery: jnp.ndarray,    # (N, D) normalized
    labels: jnp.ndarray,     # (N,) int32
    ks: Tuple[int, ...],     # ascending, deduplicated, each <= N
    num_classes: int,
) -> Tuple[jnp.ndarray, ...]:
    """All ks in one pass: one sims matmul + one `top_k(max(ks))`, then each
    smaller k votes over a PREFIX of the sorted neighbor list.

    Equivalence with the per-k kernel: `lax.top_k` returns values sorted
    descending with index-stable ties, so its first k columns are exactly
    `top_k(k)` — prefix voting is bitwise-identical to the per-k path
    (pinned by tests). This collapses the reference protocol's per-k loop
    (`classification_engine.py:82` — 7 ks over one feature matrix) from
    7 matmul+top_k passes to one, and the k=642 `lax.top_k` (O(N*k), the
    dominant term) is paid once instead of once per large k.
    """
    sims = jnp.einsum("qd,nd->qn", query, gallery,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    _, idx = jax.lax.top_k(sims, ks[-1])                 # (Q, kmax)
    votes = labels[idx]                                  # (Q, kmax)
    counts = jnp.zeros((query.shape[0], num_classes), dtype=jnp.float32)
    preds = []
    prev = 0
    for k in ks:
        # one-hot in column blocks: bounds the (Q, block, C) temp to ~128 MB
        # at Q=4096, C=61 instead of materializing (Q, 602, C) per segment.
        for c0 in range(prev, k, 128):
            blk = votes[:, c0:min(c0 + 128, k)]
            counts = counts + jnp.sum(
                jax.nn.one_hot(blk, num_classes, dtype=jnp.float32), axis=1)
        prev = k
        preds.append(jnp.argmax(counts, axis=1).astype(jnp.int32))
    return tuple(preds)


def knn_predict_multi(
    train_features: np.ndarray,
    train_labels: np.ndarray,
    test_features: np.ndarray,
    ks: Sequence[int],
    num_classes: int | None = None,
    chunk: int = 4096,
    normalized: bool = True,
) -> Dict[int, np.ndarray]:
    """Predictions for every k over one shared sims+top-k pass per chunk."""
    if num_classes is None:
        num_classes = int(max(train_labels.max(), 0)) + 1
    n = train_features.shape[0]
    clipped = {k: min(k, n) for k in ks}
    uniq = tuple(sorted(set(clipped.values())))
    gallery = jnp.asarray(train_features, dtype=jnp.float32)
    labels = jnp.asarray(train_labels, dtype=jnp.int32)
    if not normalized:
        gallery = l2_normalize(gallery)
    per_k = [[] for _ in uniq]
    for start in range(0, test_features.shape[0], chunk):
        q = jnp.asarray(test_features[start:start + chunk], dtype=jnp.float32)
        if not normalized:
            q = l2_normalize(q)
        out = _knn_predict_multi_chunk(q, gallery, labels, uniq, num_classes)
        for buf, o in zip(per_k, out):
            buf.append(np.asarray(o))
    stacked = dict(zip(uniq, (np.concatenate(b) for b in per_k)))
    return {k: stacked[clipped[k]] for k in ks}


def knn_eval(
    train_features: np.ndarray,
    train_labels: np.ndarray,
    test_features: np.ndarray,
    test_labels: np.ndarray,
    ks: Sequence[int] = DEFAULT_KS,
    num_classes: int | None = None,
) -> Dict[int, Dict]:
    """Accuracy (+ report fields) per k — mirrors `knn_eval`'s txt output
    content (`classification_engine.py:71-98`). All ks share one
    sims+top-k device pass per query chunk (`knn_predict_multi`)."""
    if num_classes is None:
        num_classes = int(max(train_labels.max(), test_labels.max())) + 1
    all_preds = knn_predict_multi(train_features, train_labels,
                                  test_features, ks, num_classes)
    results = {}
    for k in ks:
        preds = all_preds[k]
        acc = float(np.mean(preds == test_labels))
        cm = np.zeros((num_classes, num_classes), dtype=np.int64)
        np.add.at(cm, (test_labels.astype(np.int64), preds.astype(np.int64)), 1)
        results[k] = {
            "accuracy": acc,
            "confusion_matrix": cm,
            "predictions": preds,
        }
    return results


def format_knn_report(results: Dict[int, Dict]) -> str:
    """Text summary in the spirit of `knn_evaluation_results.txt`."""
    lines = []
    for k, r in sorted(results.items()):
        lines.append(f"k={k}: accuracy={r['accuracy']:.4f}")
    return "\n".join(lines) + "\n"
