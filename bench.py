"""Headline benchmark: embed throughput (images/sec/chip) of the flagship
backbone (ResNet-50, bf16, eval transform on device) — the metric named in
BASELINE.json ("images/sec/chip embed throughput").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Methodology notes (axon relay backend): `block_until_ready()` does not block
and per-dispatch latency is ~seconds, so the iteration loop runs INSIDE one
jitted `lax.scan` with a data dependency between iterations (the scalar sum
of each batch's features perturbs the next batch's input by +0.0), and the
fixed dispatch overhead is removed by differencing two iteration counts.

vs_baseline: the reference never measures throughput (BASELINE.md,
"published": {}), so the denominator is a documented estimate of the
reference PyTorch pipeline's per-GPU ResNet-50 fp16 inference throughput on
an A100-class device (~2200 img/s). The driver's north-star target is
vs_baseline >= 5.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_EMBED_IPS = 2200.0
BATCH = 256
ITERS_SMALL = 2
ITERS_LARGE = 12


def main() -> None:
    from hairci.aug.pipelines import knn_transform
    from hairci.ssl import build_recipe

    print(f"devices: {jax.devices()}", file=sys.stderr)
    recipe = build_recipe(
        "simclr", backbone="resnet50", img_size=224, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    images_host = rng.integers(0, 256, (BATCH, 224, 224, 3), dtype=np.uint8)
    state = recipe.create_state(jax.random.key(0), jnp.asarray(images_host[:8]))

    @partial(jax.jit, static_argnames="iters")
    def embed_loop(params, batch_stats, imgs, iters):
        x0 = knn_transform(imgs)

        def body(carry, _):
            x = x0 + carry * 0.0  # serialize iterations without changing values
            feats = recipe.module.apply(
                {"params": params, "batch_stats": batch_stats},
                x, train=False, method=recipe.module.extract_features)
            return jnp.sum(feats), ()

        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return carry

    imgs = jnp.asarray(images_host)

    def run(iters):
        t0 = time.perf_counter()
        val = float(embed_loop(state.params, state.batch_stats, imgs, iters))
        return time.perf_counter() - t0, val

    # compile both variants
    for it in (ITERS_SMALL, ITERS_LARGE):
        dt, _ = run(it)
        print(f"compile+run iters={it}: {dt:.1f}s", file=sys.stderr)

    t_small, _ = run(ITERS_SMALL)
    t_large, val = run(ITERS_LARGE)
    per_iter = (t_large - t_small) / (ITERS_LARGE - ITERS_SMALL)
    assert np.isfinite(val), "non-finite features"
    n_chips = max(jax.device_count(), 1)
    ips = BATCH / per_iter / n_chips
    print(
        f"embed: {ips:.1f} img/s/chip ({per_iter*1e3:.2f} ms/batch of {BATCH};"
        f" fixed overhead {t_small - ITERS_SMALL*per_iter:.2f}s)",
        file=sys.stderr)

    print(json.dumps({
        "metric": "resnet50_embed_throughput",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_EMBED_IPS, 3),
    }))


if __name__ == "__main__":
    main()
