"""Linear probe — multinomial logistic regression on frozen features,
parity with `Classifier.linear_probe_eval`
(`/root/reference/HairPretraining/src/classification_engine.py:101-127`:
sklearn `LogisticRegression(max_iter=5000, solver="lbfgs",
multi_class="multinomial")`, i.e. L2-regularized softmax regression, C=1).

TPU-first: a jitted full-batch L-BFGS fit (optax.lbfgs) of the identical
objective — mean CE + (1/(2C·N))·||W||² — so the probe runs on device at
matmul speed; `backend="sklearn"` remains as the oracle for parity tests.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _objective(params, X, y, C, n):
    W, b = params
    logits = X @ W + b
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
    # sklearn minimizes C * sum CE + 0.5 ||W||^2  ≡  mean CE + ||W||²/(2CN)
    reg = 0.5 / (C * n) * jnp.sum(W * W)
    return ce + reg


@partial(jax.jit, static_argnames=("num_classes", "max_iter"))
def _fit_lbfgs(X, y, num_classes: int, max_iter: int = 500, C: float = 1.0):
    D = X.shape[1]
    n = X.shape[0]
    params = (jnp.zeros((D, num_classes)), jnp.zeros((num_classes,)))
    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(
        lambda p: _objective(p, X, y, C, n))

    def step(carry, _):
        params, opt_state = carry
        value, grad = value_and_grad(params, state=opt_state)
        updates, opt_state = opt.update(
            grad, opt_state, params, value=value, grad=grad,
            value_fn=lambda p: _objective(p, X, y, C, n))
        params = optax.apply_updates(params, updates)
        return (params, opt_state), value

    (params, _), values = jax.lax.scan(
        step, (params, opt.init(params)), None, length=max_iter)
    return params, values


def linear_probe_fit_predict(
    train_features: np.ndarray,
    train_labels: np.ndarray,
    test_features: np.ndarray,
    num_classes: int | None = None,
    backend: str = "jax",
    max_iter: int = 500,
) -> np.ndarray:
    """Train the probe and return test predictions."""
    if num_classes is None:
        num_classes = int(train_labels.max()) + 1
    if backend == "sklearn":
        from sklearn.linear_model import LogisticRegression

        clf = LogisticRegression(max_iter=5000, solver="lbfgs")
        clf.fit(train_features, train_labels)
        return clf.predict(test_features)
    X = jnp.asarray(train_features, jnp.float32)
    y = jnp.asarray(train_labels, jnp.int32)
    (W, b), _ = _fit_lbfgs(X, y, num_classes, max_iter)
    logits = jnp.asarray(test_features, jnp.float32) @ W + b
    return np.asarray(jnp.argmax(logits, axis=1))


def linear_probe_eval(
    train_features: np.ndarray,
    train_labels: np.ndarray,
    test_features: np.ndarray,
    test_labels: np.ndarray,
    backend: str = "jax",
) -> Dict:
    num_classes = int(max(train_labels.max(), test_labels.max())) + 1
    preds = linear_probe_fit_predict(
        train_features, train_labels, test_features, num_classes, backend)
    acc = float(np.mean(preds == test_labels))
    cm = np.zeros((num_classes, num_classes), dtype=np.int64)
    np.add.at(cm, (test_labels.astype(np.int64), preds.astype(np.int64)), 1)
    return {"accuracy": acc, "predictions": preds, "confusion_matrix": cm}
