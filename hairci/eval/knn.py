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


def knn_eval(
    train_features: np.ndarray,
    train_labels: np.ndarray,
    test_features: np.ndarray,
    test_labels: np.ndarray,
    ks: Sequence[int] = DEFAULT_KS,
    num_classes: int | None = None,
) -> Dict[int, Dict]:
    """Accuracy (+ report fields) per k — mirrors `knn_eval`'s txt output
    content (`classification_engine.py:71-98`)."""
    if num_classes is None:
        num_classes = int(max(train_labels.max(), test_labels.max())) + 1
    results = {}
    for k in ks:
        preds = knn_predict(train_features, train_labels, test_features, k,
                            num_classes)
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
