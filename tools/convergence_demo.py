"""End-to-end SHAM learning validation on the real TPU.

Trains the flagship HSimCLR/SHAM recipe (resnet18) on a device-resident
synthetic dataset where the class signal is stripe ORIENTATION (color is
randomized per image, so raw color statistics carry no label information)
and reports kNN(k=5, cosine) accuracy of the learned features before vs
after training.

Relay-environment design: the dataset is transferred to the device ONCE and
every epoch runs as a single jitted `lax.scan` over its batches (the axon
relay's host->device bandwidth would otherwise cap streaming at ~130 img/s;
see BENCH_RESULTS.md). Run: `python -m tools.convergence_demo`.
"""
from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hairci.ssl import build_recipe


def make_dataset(n: int, classes: int, size: int, seed: int):
    """Stripe-orientation classes; per-image random color/phase/frequency."""
    rng = np.random.default_rng(seed)
    ys = np.arange(n) % classes
    xs = np.empty((n, size, size, 3), np.uint8)
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    for i, c in enumerate(ys):
        theta = np.pi * c / classes
        freq = rng.uniform(4.0, 6.0)
        phase = rng.uniform(0, 2 * np.pi)
        wave = np.sin(2 * np.pi * freq *
                      (xx * np.cos(theta) + yy * np.sin(theta)) / size + phase)
        stripes = (wave > 0).astype(np.float32)[..., None]
        color_a = rng.uniform(0.2, 1.0, 3)
        color_b = rng.uniform(0.0, 0.6, 3)
        img = stripes * color_a + (1 - stripes) * color_b
        img = img + rng.normal(0, 0.08, img.shape)
        xs[i] = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    perm = rng.permutation(n)
    return xs[perm], ys[perm]


def knn_accuracy(feats_train, y_train, feats_test, y_test, k=5, classes=8):
    """On-device cosine kNN majority vote (classification_engine parity)."""
    def _norm(z):
        return z / jnp.linalg.norm(z, axis=1, keepdims=True).clip(1e-12)

    sim = _norm(feats_test) @ _norm(feats_train).T
    _, idx = jax.lax.top_k(sim, k)
    votes = jax.nn.one_hot(y_train[idx], classes).sum(axis=1)
    pred = jnp.argmax(votes, axis=1)
    return float(jnp.mean(pred == y_test))


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    C, B, SIZE = 8, 256, 96
    N_TRAIN, N_TEST = 1024, 256
    EPOCHS, WARMUP = 24, 6
    nb = N_TRAIN // B

    xs, ys = make_dataset(N_TRAIN + N_TEST, C, SIZE, seed=0)
    x_train = jnp.asarray(xs[:N_TRAIN])
    y_train = jnp.asarray(ys[:N_TRAIN])
    x_test = jnp.asarray(xs[N_TRAIN:])
    y_test = jnp.asarray(ys[N_TRAIN:])

    recipe = build_recipe("SHAM", backbone="resnet18", img_size=SIZE,
                          dtype=jnp.bfloat16, warm_up_epochs=WARMUP,
                          num_batches=nb)
    state = recipe.create_state(jax.random.key(0), x_train[:B])

    batches = x_train.reshape(nb, B, SIZE, SIZE, 3)

    @partial(jax.jit, static_argnames=("stage", "epochs"))
    def run_epochs(state, batches, stage, epoch0, k, epochs):
        def epoch_body(carry, e):
            st, _ = carry

            def batch_body(c, bi):
                st, _ = c
                rng = jax.random.fold_in(jax.random.key(1), e * nb + bi)
                st, m = recipe.train_step(st, {"image": batches[bi]}, rng,
                                          stage=stage, batch_id=bi, k=k)
                return (st, m["loss"]), m["margin_violations"]

            (st, loss), viol = jax.lax.scan(
                batch_body, (st, jnp.float32(0)), jnp.arange(nb))
            return (st, loss), (loss, viol.sum())

        (state, _), (losses, viols) = jax.lax.scan(
            epoch_body, (state, jnp.float32(0)), epoch0 + jnp.arange(epochs))
        return state, losses, viols

    @jax.jit
    def features(state, images):
        return recipe.extract_features(state, images)

    f_tr0 = features(state, x_train)
    f_te0 = features(state, x_test)
    acc0 = knn_accuracy(f_tr0, y_train, f_te0, y_test, classes=C)
    print(f"kNN@5 accuracy, untrained features: {acc0:.3f}")

    t0 = time.perf_counter()
    # warm-up stage (random derangement negatives)
    state, losses_w, viols = run_epochs(
        state, batches, "warmup", jnp.int32(0), jnp.int32(7), WARMUP - 1)
    # mine stage: k adapted from the previous epoch's margin violations
    k = recipe.adapt_k(float(viols[-1]) / nb, B)
    print(f"warm-up losses: {np.asarray(losses_w).round(3).tolist()}; "
          f"adapted k={k}")
    state, losses_m, _ = run_epochs(
        state, batches, "mine", jnp.int32(WARMUP - 1), jnp.int32(k), 1)
    # mined stage (cached k-th-NN negatives)
    state, losses, _ = run_epochs(
        state, batches, "mined", jnp.int32(WARMUP), jnp.int32(k),
        EPOCHS - WARMUP)
    dt = time.perf_counter() - t0
    all_losses = np.concatenate([losses_w, losses_m, losses])
    print(f"epoch losses: {np.asarray(all_losses).round(3).tolist()}")
    print(f"trained {EPOCHS} epochs x {N_TRAIN} imgs in {dt:.1f}s wall "
          f"(incl. relay dispatch)")

    f_tr = features(state, x_train)
    f_te = features(state, x_test)
    acc1 = knn_accuracy(f_tr, y_train, f_te, y_test, classes=C)
    print(f"kNN@5 accuracy, SHAM-trained features: {acc1:.3f} "
          f"(untrained {acc0:.3f})")


if __name__ == "__main__":
    main()
