"""Attribute SHAM train-step time to components on the real TPU
(in-jit scan differencing, bench.py methodology)."""
from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hairci.aug.hair_masking import mask_hair_patches
from hairci.aug.pipelines import (positive_masking_transform,
                                  positive_transform, simclr_transform)
from hairci.aug.ops import gaussian_blur, random_rotate


def timed(run, small, large, repeats=2):
    for it in (small, large):
        t0 = time.perf_counter()
        run(it)
    ts = min(_t(run, small) for _ in range(repeats))
    tl = min(_t(run, large) for _ in range(repeats))
    return max((tl - ts) / (large - small), 1e-9)


def _t(run, it):
    t0 = time.perf_counter()
    run(it)
    return time.perf_counter() - t0


def bench_op(name, fn, x, small=2, large=12):
    @partial(jax.jit, static_argnames="iters")
    def loop(x, iters):
        def body(carry, i):
            y = fn(jax.random.fold_in(jax.random.key(0), i), x + carry * 0.0)
            return jnp.sum(y.astype(jnp.float32)), ()

        carry, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return carry

    def run(it):
        return float(loop(x, it))

    ms = timed(run, small, large) * 1e3
    print(f"{name}: {ms:.1f} ms")
    return ms


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (256, 224, 224, 3)).astype(np.float32))
    tfm = simclr_transform(224)

    bench_op("two-view simclr transform", lambda k, im: tfm(k, im)[0], x)
    bench_op("positive_transform (fused pallas on tpu)", positive_transform,
             x)
    bench_op("  random_rotate shear (xla)",
             lambda k, im: random_rotate(k, im, method="shear"), x)
    bench_op("  random_rotate gather (old)",
             lambda k, im: random_rotate(k, im, method="gather"), x)
    bench_op("  gaussian_blur alone (k=3)",
             lambda k, im: gaussian_blur(k, im, 3, (0.1, 0.5), p=1.0), x)
    bench_op("positive_masking_transform",
             lambda k, im: positive_masking_transform(k, im), x)
    bench_op("neg gather (take)",
             lambda k, im: jnp.take(im, jax.random.permutation(k, 256),
                                    axis=0), x)


if __name__ == "__main__":
    main()
