"""2-D embedding visualization — `Classifier.save_umap`
(`/root/reference/HairPretraining/src/classification_engine.py:130-204`).

umap-learn is not available in this image; when importable it is used with
the reference's parameters, otherwise the projection falls back to PCA (via
`jnp.linalg.eigh` of the feature covariance — the same on-device PCA used for
FAISS K-estimation replacement). The artifact (scatter PNG + the 2-D coords
npz) is produced either way.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def project_2d(features: np.ndarray, n_neighbors: int = 15,
               min_dist: float = 0.1, metric: str = "cosine",
               random_state: int = 42) -> np.ndarray:
    try:
        import umap  # type: ignore

        reducer = umap.UMAP(n_neighbors=n_neighbors, min_dist=min_dist,
                            metric=metric, random_state=random_state)
        return np.asarray(reducer.fit_transform(features))
    except ImportError:
        return pca_2d(features)


def pca_2d(features: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    x = jnp.asarray(features, jnp.float32)
    x = x - x.mean(axis=0, keepdims=True)
    cov = (x.T @ x) / max(x.shape[0] - 1, 1)
    eigvals, eigvecs = jnp.linalg.eigh(cov)
    top2 = eigvecs[:, -2:][:, ::-1]
    return np.asarray(x @ top2)


def save_umap(features: np.ndarray, labels: np.ndarray, save_path: str,
              filename: str = "umap.png", point_size: int = 5,
              alpha: float = 0.8, **kw) -> str:
    coords = project_2d(features, **kw)
    os.makedirs(save_path, exist_ok=True)
    out = os.path.join(save_path, filename)
    np.savez(out.replace(".png", ".npz"), coords=coords, labels=labels)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 8))
        sc = ax.scatter(coords[:, 0], coords[:, 1], c=labels, s=point_size,
                        alpha=alpha, cmap="tab20")
        fig.colorbar(sc, ax=ax)
        ax.set_title("Embedding projection")
        fig.savefig(out, dpi=300, bbox_inches="tight")
        plt.close(fig)
    except ImportError:
        pass
    return out
