"""ViT-family throughput on the real TPU: ViT-B/16 embed, MAE pretrain
step, DINOv2 step (bench.py methodology: in-jit lax.scan with a data
dependency, fixed overhead removed by differencing two iteration counts).
Run: `python -m tools.vit_bench`."""
from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hairci.ssl import build_recipe

BATCH = 256


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


def bench_embed(recipe, images, batch):
    from hairci.aug.pipelines import knn_transform

    state = recipe.create_state(jax.random.key(0), images[:8])
    variables = {"params": state.params}
    if getattr(state, "batch_stats", None):
        variables["batch_stats"] = state.batch_stats

    @partial(jax.jit, static_argnames="iters")
    def loop(state, imgs, iters):
        x0 = knn_transform(imgs)

        def body(carry, _):
            feats = recipe.extract_features(state, x0 + carry * 0.0)
            return jnp.sum(feats.astype(jnp.float32)), ()

        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return carry

    def run(it):
        return float(loop(state, images, it))

    return batch / timed(run, 2, 12)


def bench_train(recipe, images, batch, **step_kw):
    state = recipe.create_state(jax.random.key(0), images[:8])

    @partial(jax.jit, static_argnames="iters")
    def loop(state, imgs, iters):
        def body(carry, i):
            st, _ = carry
            st, m = recipe.train_step(
                st, {"image": imgs}, jax.random.fold_in(jax.random.key(0), i),
                **step_kw)
            return (st, m["loss"]), ()

        (state, loss), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), jnp.arange(iters))
        return loss

    def run(it):
        return float(loop(state, images, it))

    return batch / timed(run, 1, 5)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (BATCH, 224, 224, 3), dtype=np.uint8))

    vit = build_recipe("mae", backbone="vit_base_patch16", img_size=224,
                       dtype=jnp.bfloat16)
    ips = bench_embed(vit, images, BATCH)
    print(f"ViT-B/16 embed: {ips:.1f} img/s/chip")

    ips = bench_train(vit, images, BATCH)
    print(f"MAE pretrain step (mask 0.75, depth-8 decoder): "
          f"{ips:.1f} img/s/chip")

    dino = build_recipe("dinov2", backbone="vit_base_patch16", img_size=224,
                        dtype=jnp.bfloat16)
    ips = bench_train(dino, images, BATCH)
    print(f"DINOv2 step (2 global views, iBOT masking, EMA teacher): "
          f"{ips:.1f} img/s/chip")


if __name__ == "__main__":
    main()
