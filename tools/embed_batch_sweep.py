"""Embed-throughput vs batch size on the real TPU (bench.py methodology:
in-jit lax.scan with a data dependency, differenced iteration counts)."""
from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hairci.aug.pipelines import knn_transform
from hairci.ssl import build_recipe


def timed(run, small, large, repeats=2):
    for it in (small, large):
        t0 = time.perf_counter()
        run(it)
        print(f"  compile+run iters={it}: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
    ts = min(_t(run, small) for _ in range(repeats))
    tl = min(_t(run, large) for _ in range(repeats))
    return max((tl - ts) / (large - small), 1e-9)


def _t(run, it):
    t0 = time.perf_counter()
    run(it)
    return time.perf_counter() - t0


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    recipe = build_recipe("simclr", backbone="resnet50", img_size=224,
                          dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    imgs8 = jnp.asarray(rng.integers(0, 256, (8, 224, 224, 3), dtype=np.uint8))
    state = recipe.create_state(jax.random.key(0), imgs8)

    @partial(jax.jit, static_argnames="iters")
    def loop(params, batch_stats, imgs, iters):
        x0 = knn_transform(imgs)

        def body(carry, _):
            x = x0 + carry * 0.0
            feats = recipe.module.apply(
                {"params": params, "batch_stats": batch_stats},
                x, train=False, method=recipe.module.extract_features)
            return jnp.sum(feats), ()

        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return carry

    for bs in (256, 512, 1024):
        images = jnp.asarray(
            rng.integers(0, 256, (bs, 224, 224, 3), dtype=np.uint8))

        def run(it):
            return float(loop(state.params, state.batch_stats, images, it))

        per_iter = timed(run, 2, 12)
        print(f"bs={bs}: {bs/per_iter:.0f} img/s ({per_iter*1e3:.1f} ms/iter)")


if __name__ == "__main__":
    main()
