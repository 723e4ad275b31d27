"""`Classifier` facade — the evaluation engine with the reference's API and
artifact formats (`/root/reference/HairPretraining/src/classification_engine.py:18-281`):
`knn_eval` → knn_evaluation_results.txt, `linear_probe_eval` →
linear_probe_results.txt, `save_umap` → png, `compute_intra_inter_variance`
→ variance_analysis_<split>.txt. Feature extraction runs jitted on device
with L2 normalization (`:39-69`).
"""

from __future__ import annotations

import os
from typing import Iterable, Optional, Sequence, Tuple

import numpy as np

from hairci.eval.features import extract_features
from hairci.eval.knn import DEFAULT_KS, knn_predict_multi
from hairci.eval.linear_probe import linear_probe_fit_predict
from hairci.eval.umap_export import save_umap
from hairci.eval.variance import compute_intra_inter_variance, format_variance_report


def _report(y_true, y_pred) -> Tuple[float, str, np.ndarray]:
    from sklearn.metrics import (accuracy_score, classification_report,
                                 confusion_matrix)

    acc = accuracy_score(y_true, y_pred)
    report = classification_report(y_true, y_pred, zero_division=0)
    cm = confusion_matrix(y_true, y_pred)
    return float(acc), report, cm


class Classifier:
    """Args mirror the reference: a model with `extract_features` (here a
    recipe+state pair or a raw embed_fn), train/test loaders, save_path."""

    def __init__(self, embed_fn, train_loader, test_loader, save_path: str,
                 batch_size: int = 256):
        self.embed_fn = embed_fn
        self.train_loader = train_loader
        self.test_loader = test_loader
        self.save_path = save_path
        self.batch_size = batch_size
        os.makedirs(save_path, exist_ok=True)
        self._cached = None

    def extracting_features(self):
        if self._cached is None:
            tr_f, tr_l = extract_features(
                self.embed_fn, iter(self.train_loader), self.batch_size)
            te_f, te_l = extract_features(
                self.embed_fn, iter(self.test_loader), self.batch_size)
            self._cached = (tr_f, tr_l, te_f, te_l)
        return self._cached

    # ------------------------------------------------------------------
    def knn_eval(self, ks: Sequence[int] = DEFAULT_KS) -> dict:
        tr_f, tr_l, te_f, te_l = self.extracting_features()
        num_classes = int(max(tr_l.max(), te_l.max())) + 1
        path = os.path.join(self.save_path, "knn_evaluation_results.txt")
        with open(path, "w") as f:
            f.write("KNN Evaluation Results\n")
            f.write("=" * 50 + "\n\n")
        # all ks share one sims + top_k(max k) device pass per query chunk
        # (bitwise-identical to per-k knn_predict — pinned in tests/test_knn)
        all_preds = knn_predict_multi(tr_f, tr_l, te_f, ks, num_classes)
        results = {}
        for k in ks:
            preds = all_preds[k]
            acc, report, cm = _report(te_l, preds)
            results[k] = acc
            with open(path, "a") as f:
                f.write(f"Results for k={k}\n")
                f.write("-" * 40 + "\n")
                f.write(f"Accuracy: {acc:.4f}\n\n")
                f.write("Classification Report:\n")
                f.write(report + "\n\n")
                f.write("Confusion Matrix:\n")
                f.write(np.array2string(cm) + "\n\n")
                f.write("=" * 50 + "\n\n")
        return results

    def linear_probe_eval(self, backend: str = "jax") -> float:
        tr_f, tr_l, te_f, te_l = self.extracting_features()
        num_classes = int(max(tr_l.max(), te_l.max())) + 1
        preds = linear_probe_fit_predict(tr_f, tr_l, te_f, num_classes,
                                         backend=backend)
        acc, report, cm = _report(te_l, preds)
        path = os.path.join(self.save_path, "linear_probe_results.txt")
        with open(path, "w") as f:
            f.write("Linear Probe Evaluation Results\n")
            f.write("=" * 50 + "\n\n")
            f.write(f"Accuracy: {acc:.4f}\n\n")
            f.write("Classification Report:\n")
            f.write(report + "\n\n")
            f.write("Confusion Matrix:\n")
            f.write(np.array2string(cm) + "\n\n")
            f.write("=" * 50 + "\n\n")
        return acc

    def save_umap(self, split: str = "both", **kw) -> str:
        tr_f, tr_l, te_f, te_l = self.extracting_features()
        if split == "train":
            f, l = tr_f, tr_l
        elif split == "test":
            f, l = te_f, te_l
        else:
            f = np.concatenate([tr_f, te_f])
            l = np.concatenate([tr_l, te_l])
        return save_umap(f, l, self.save_path,
                         filename=f"umap_{split}.png", **kw)

    def compute_intra_inter_variance(self, split: str = "test") -> dict:
        tr_f, tr_l, te_f, te_l = self.extracting_features()
        if split == "train":
            f, l = tr_f, tr_l
        elif split == "test":
            f, l = te_f, te_l
        else:
            f = np.concatenate([tr_f, te_f])
            l = np.concatenate([tr_l, te_l])
        results = compute_intra_inter_variance(f, l)
        path = os.path.join(self.save_path, f"variance_analysis_{split}.txt")
        with open(path, "w") as fo:
            fo.write(format_variance_report(results))
        return results
