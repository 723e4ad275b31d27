"""Benchmarks on the real TPU chip. Prints ONE JSON line (headline =
ResNet-50 embed throughput, the metric named in BASELINE.json); SimCLR
train-step throughput and retrieval query latency go to stderr.

Methodology (axon relay backend): `block_until_ready()` does not block and
per-dispatch latency is ~seconds, so every measured loop runs INSIDE one
jitted `lax.scan` with a data dependency between iterations, and fixed
dispatch overhead is removed by differencing two iteration counts
(.claude/skills/verify/SKILL.md).

vs_baseline: the reference publishes no numbers (BASELINE.md); the
denominator is a documented estimate of the PyTorch reference pipeline's
ResNet-50 fp16 inference throughput on an A100-class GPU (~2200 img/s).
North-star target: vs_baseline >= 5.
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
BASELINE_TRAIN_IPS = 800.0   # A100 torch SimCLR RN50 fwd+bwd estimate
BATCH = 256
# MFU denominators: TPU v5e nominal bf16 peak, and the max this relay chip
# has measurably sustained — 122 TFLOP/s on an isolated bs-256 56x56x64 3x3
# bf16 conv, ~179 TF/s effective on its fwd+bwd
# (tools/fused_conv_bn_bench.py, r2).
V5E_PEAK_FLOPS = 197e12
OBSERVED_SUSTAIN_FLOPS = 122e12
# SimCLR RN50 bs-256 model FLOPs per step: 2 views x fwd+bwd convs+matmuls,
# 6.3e12 from the compiled-HLO conv inventory (BENCH_RESULTS.md
# "BN-reduce investigation").
SIMCLR_STEP_FLOPS = 6.3e12
# Fallback ViT-B/16 224px embed FLOPs per image (compiled-HLO snapshot,
# tools/vit_bench.py embed section) — used only when the relay backend
# hides cost_analysis; bench_embed_vit recomputes it at runtime so model
# changes (depth, GELU form, patch size) can't silently skew the MFU.
VIT_EMBED_FLOPS_PER_IMG_FALLBACK = 35.3e9


def _timed(run, small, large, repeats: int = 2):
    for it in (small, large):
        t0 = time.perf_counter()
        run(it)
        print(f"  compile+run iters={it}: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
    t_small = min(_t(run, small) for _ in range(repeats))
    t_large = min(_t(run, large) for _ in range(repeats))
    return max((t_large - t_small) / (large - small), 0.0)


def _t(run, it):
    t0 = time.perf_counter()
    run(it)
    return time.perf_counter() - t0


def _compiled_flops_per_img(fn, *args):
    """FLOPs/img of the exact compiled graph via XLA cost_analysis (the
    relay backend may hide it -> None). Counts use XLA's 2-flops-per-MAC
    convention — the right numerator for MFU against peak/sustain numbers
    quoted in the same convention (tools/resnet_bench.py)."""
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan"))) / BATCH
        return flops if flops == flops and flops > 0 else None
    except Exception as e:
        print(f"  cost_analysis unavailable ({e})", file=sys.stderr)
        return None


def bench_embed(recipe, images):
    """ResNet-50 embed headline. Returns (img/s, FLOPs/img or None)."""
    from hairci.aug.pipelines import knn_transform

    state = recipe.create_state(jax.random.key(0), images[:8])

    def features(params, batch_stats, x):
        return recipe.module.apply(
            {"params": params, "batch_stats": batch_stats},
            x, train=False, method=recipe.module.extract_features)

    @partial(jax.jit, static_argnames="iters")
    def loop(params, batch_stats, imgs, iters):
        x0 = knn_transform(imgs)

        def body(carry, _):
            feats = features(params, batch_stats, x0 + carry * 0.0)
            return jnp.sum(feats), ()

        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return carry

    def run(it):
        return float(loop(state.params, state.batch_stats, images, it))

    per_iter = _timed(run, 2, 12)
    flops = _compiled_flops_per_img(features, state.params, state.batch_stats,
                                    knn_transform(images))
    return BATCH / per_iter, flops


def bench_train(recipe, images) -> float:
    state = recipe.create_state(jax.random.key(0), images[:8])

    @partial(jax.jit, static_argnames="iters")
    def loop(state, imgs, iters):
        def body(carry, i):
            st, _ = carry
            st, metrics = recipe.train_step(
                st, {"image": imgs}, jax.random.fold_in(jax.random.key(0), i))
            return (st, metrics["loss"]), ()

        (state, loss), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), jnp.arange(iters))
        return loss

    def run(it):
        return float(loop(state, images, it))

    per_iter = _timed(run, 1, 6)
    return BATCH / per_iter


def bench_train_sham(images) -> float:
    """Flagship HSimCLR/SHAM step in its steady state (stage="mined"):
    EMA update + cached-negative gather + fused 3B online forward +
    momentum forward + NTXent/triplet/MSE + Adam."""
    from hairci.ssl import build_recipe

    recipe = build_recipe(
        "SHAM", backbone="resnet50", img_size=224, dtype=jnp.bfloat16,
        num_batches=1)
    state = recipe.create_state(jax.random.key(0), images)

    @partial(jax.jit, static_argnames="iters")
    def loop(state, imgs, iters):
        def body(carry, i):
            st, _ = carry
            st, metrics = recipe.train_step(
                st, {"image": imgs}, jax.random.fold_in(jax.random.key(0), i),
                stage="mined", batch_id=0)
            return (st, metrics["loss"]), ()

        (state, loss), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), jnp.arange(iters))
        return loss

    def run(it):
        return float(loop(state, images, it))

    per_iter = _timed(run, 1, 5)
    return BATCH / per_iter


def bench_embed_vit(images):
    """ViT-B/16 embed (the reference's `--model vit_b_16` eval path,
    `/root/reference/src/models_vit.py:26-270`): bf16 blocks with bf16
    attention scores + f32-accumulated softmax (models/vit.py).

    Returns (img/s, FLOPs/img). The eval transform is applied once
    outside the scan and the module's extract_features is applied
    directly to the transformed batch (mirroring bench_embed) — the
    recipe-level extract_features would re-run knn_transform inside
    every timed iteration on double-normalized inputs."""
    from hairci.aug.pipelines import knn_transform
    from hairci.ssl import build_recipe

    recipe = build_recipe("mae", backbone="vit_base_patch16", img_size=224,
                          dtype=jnp.bfloat16)
    state = recipe.create_state(jax.random.key(0), images[:8])

    def features(params, x):
        return recipe.module.apply({"params": params}, x, train=False,
                                   method=recipe.module.extract_features)

    @partial(jax.jit, static_argnames="iters")
    def loop(params, imgs, iters):
        x0 = knn_transform(imgs)  # once, outside the loop (= bench_embed)

        def body(carry, _):
            feats = features(params, x0 + carry * 0.0)
            return jnp.sum(feats.astype(jnp.float32)), ()

        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return carry

    def run(it):
        return float(loop(state.params, images, it))

    ips = BATCH / _timed(run, 2, 12)

    # runtime count of the exact compiled forward (relay may hide it)
    measured = _compiled_flops_per_img(features, state.params,
                                       knn_transform(images))
    if measured is None:
        print(f"  using fallback {VIT_EMBED_FLOPS_PER_IMG_FALLBACK/1e9:.1f} "
              "GFLOP/img", file=sys.stderr)
    return ips, measured or VIT_EMBED_FLOPS_PER_IMG_FALLBACK


def bench_knn_100k(n: int = 103_945, q: int = 6_088, d: int = 2048,
                   k: int = 5, num_classes: int = 61,
                   chunk: int = 4096, ks=None) -> float:
    """kNN eval compute at the reference's real scale (VERDICT r2 #4):
    one full query-set prediction pass over a 103,945 x 2048 gallery with
    6,088 queries — the exact shape of the reference's north-star eval
    (`classification_engine.py:71-98`, data_train.csv x
    data_test_combination3.csv). Uses the shipped predict chunk (f32-exact
    Precision.HIGHEST sims); with ``ks`` a tuple, the shipped multi-k
    kernel (ALL reference ks over one shared sims + top_k pass — what
    knn_eval runs). Gallery/queries are synthesized ON DEVICE: shipping
    851 MB through the relay (~25-35 MB/s) would dominate."""
    from hairci.eval.knn import _knn_predict_chunk, _knn_predict_multi_chunk

    q_pad = (q + chunk - 1) // chunk * chunk

    @jax.jit
    def make():
        kg, kq, kl = jax.random.split(jax.random.key(0), 3)
        g = jax.random.normal(kg, (n, d), jnp.float32)
        g = g / jnp.linalg.norm(g, axis=1, keepdims=True)
        qf = jax.random.normal(kq, (q_pad // chunk, chunk, d), jnp.float32)
        qf = qf / jnp.linalg.norm(qf, axis=2, keepdims=True)
        y = jax.random.randint(kl, (n,), 0, num_classes, dtype=jnp.int32)
        return g, qf, y

    g, qc, y = make()

    @partial(jax.jit, static_argnames="iters")
    def loop(qc, g, y, iters):
        def body(carry, _):
            def inner(acc, qrows):
                qrows = qrows + carry.astype(qrows.dtype) * 0
                if ks is not None:
                    ps = _knn_predict_multi_chunk(qrows, g, y, tuple(ks),
                                                  num_classes)
                    return acc + sum(jnp.sum(p) for p in ps), None
                p = _knn_predict_chunk(qrows, g, y, k, num_classes)
                return acc + jnp.sum(p), None

            acc, _ = jax.lax.scan(inner, jnp.int32(0), qc)
            return jnp.float32(acc), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    def run(it):
        return float(loop(qc, g, y, it))

    return _timed(run, 2, 8)


def bench_query_latency(n_gallery: int = 100_000, d: int = 512,
                        k: int = 5) -> float:
    from hairci.ops.topk_pallas import topk_gallery_search

    rng = np.random.default_rng(0)
    g = rng.normal(size=(n_gallery, d)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    # pre-pad to the kernel chunk multiple like GalleryIndex does — padding
    # per call would re-materialize the gallery and dominate the timing
    n_pad = (n_gallery + 1023) // 1024 * 1024
    gp = np.zeros((n_pad, d), np.float32)
    gp[:n_gallery] = g
    q = g[:1].copy()
    gj, qj = jnp.asarray(gp), jnp.asarray(q)

    @partial(jax.jit, static_argnames="iters")
    def loop(q, g, iters):
        def body(carry, _):
            s, _ = topk_gallery_search(q + carry * 0.0, g, k=k,
                                       n_valid=n_gallery)
            return jnp.sum(s), ()

        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return carry

    def run(it):
        return float(loop(qj, gj, it))

    # sub-0.1ms searches need many iterations to rise above the relay's
    # wall-clock jitter
    return _timed(run, 10, 2010, repeats=3)


def main() -> None:
    import os

    from hairci.ssl import build_recipe

    # Relay compile times vary wildly between runs (the same embed graph has
    # measured 80s and 595s cold); skip non-headline sections once the
    # elapsed-time budget can no longer absorb a worst-case compile, so the
    # JSON line always prints within the driver's timeout.
    t_start = time.perf_counter()
    budget = float(os.environ.get("BENCH_BUDGET_S", "1200"))

    def remaining() -> float:
        return budget - (time.perf_counter() - t_start)

    print(f"devices: {jax.devices()}", file=sys.stderr)
    n_chips = max(jax.device_count(), 1)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (BATCH, 224, 224, 3), dtype=np.uint8))
    recipe = build_recipe(
        "simclr", backbone="resnet50", img_size=224, dtype=jnp.bfloat16)

    print("[embed]", file=sys.stderr)
    embed_ips, rn_flops = bench_embed(recipe, images)
    embed_ips /= n_chips
    print(f"embed: {embed_ips:.1f} img/s/chip "
          f"({embed_ips/BASELINE_EMBED_IPS:.2f}x est. reference)",
          file=sys.stderr)

    extra = {}
    if rn_flops is not None:
        extra.update({
            "resnet_embed_gflops_per_img": round(rn_flops / 1e9, 2),
            "resnet_embed_mfu_vs_v5e_peak": round(
                embed_ips * rn_flops / V5E_PEAK_FLOPS, 3),
            "resnet_embed_mfu_vs_observed_sustain": round(
                embed_ips * rn_flops / OBSERVED_SUSTAIN_FLOPS, 3),
        })
        for key, val in extra.items():
            print(f"  {key} = {val}", file=sys.stderr)
    # Ordered by headline priority: query_p50 is a BASELINE.json headline and
    # cheap (150s worst-case), so it runs BEFORE the 400s SHAM section —
    # round 1 skipped it on budget by running it last.
    sections = [  # (label, est. worst-case cost s, key(s) -> runner)
        ("simclr train step", 400, lambda: (
            lambda ips: {
                "simclr_train_images_per_sec_per_chip": ips,
                "simclr_train_vs_baseline": round(ips / BASELINE_TRAIN_IPS, 3),
                "simclr_train_mfu_vs_v5e_peak": round(
                    ips / BATCH * SIMCLR_STEP_FLOPS / V5E_PEAK_FLOPS, 3),
                "simclr_train_mfu_vs_observed_sustain": round(
                    ips / BATCH * SIMCLR_STEP_FLOPS / OBSERVED_SUSTAIN_FLOPS,
                    3),
            })(round(bench_train(recipe, images) / n_chips, 1))),
        ("retrieval query latency, 100k x 512 gallery", 150, lambda: {
            "query_p50_ms_100k_gallery":
                round(bench_query_latency() * 1e3, 2)}),
        ("ViT-B/16 embed", 250, lambda: (
            lambda ips_flops: {
                "vit_embed_images_per_sec_per_chip":
                    round(ips_flops[0] / n_chips, 1),
                "vit_embed_gflops_per_img": round(ips_flops[1] / 1e9, 1),
                "vit_embed_mfu_vs_v5e_peak": round(
                    ips_flops[0] / n_chips * ips_flops[1] / V5E_PEAK_FLOPS,
                    3),
                "vit_embed_mfu_vs_observed_sustain": round(
                    ips_flops[0] / n_chips * ips_flops[1]
                    / OBSERVED_SUSTAIN_FLOPS, 3),
            })(bench_embed_vit(images))),
        ("SHAM train step, mined stage", 400, lambda: {
            "sham_train_images_per_sec_per_chip":
                round(bench_train_sham(images) / n_chips, 1)}),
        ("kNN eval, reference scale 103,945x2048 / 6,088 queries, k=5", 200,
         lambda: (lambda s: {
             "knn_eval_ms_100k_k5": round(s * 1e3, 1),
             "knn_eval_ms_per_query_k5": round(s * 1e3 / 6_088, 4),
         })(bench_knn_100k())),
        ("kNN eval, all 7 reference ks (5..642) in one shared pass", 250,
         lambda: {"knn_eval_ms_100k_all7ks": round(
             bench_knn_100k(ks=(5, 10, 20, 27, 30, 40, 642)) * 1e3, 1)}),
    ]
    for label, cost, runner in sections:
        if remaining() < cost:
            print(f"[{label}] SKIPPED ({remaining():.0f}s left < {cost}s "
                  "worst-case)", file=sys.stderr)
            continue
        print(f"[{label}]", file=sys.stderr)
        got = runner()
        for key, val in got.items():
            print(f"  {key} = {val}", file=sys.stderr)
        extra.update(got)

    print(json.dumps({
        "metric": "resnet50_embed_throughput",
        "value": round(embed_ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(embed_ips / BASELINE_EMBED_IPS, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
