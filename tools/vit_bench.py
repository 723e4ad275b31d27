"""ViT-family throughput + roofline decomposition on the real TPU.

Covers the r2-verdict ask: profile and decompose the ViT path the way the
ResNet path was (BENCH_RESULTS.md), with each lever measured:
  embed       ViT-B/16 embed + compiled-HLO FLOP count -> honest MFU
  decomp      per-component embed decomposition (patchify / attention /
              dense matmuls / norms) by differencing ablated graphs
  mae         MAE pretrain step
  dinov2      DINOv2 step, remat mode sweep (full vs selective) at the
              largest batch each fits
  sham        SHAM mined-stage step with ViT-B backbone, remat sweep
  siameseim   SiameseIM step
  face        ViT-face embed (112 px serving path)
  simclr50    ResNet-50 SimCLR step + compiled FLOPs (cross-checks the
              bench.py SIMCLR_STEP_FLOPS constant)
  sham50      ResNet-50 SHAM mined step + compiled FLOPs

Train sections pass flops=True so each line carries XLA's compiled-HLO
FLOP count -> an honest MFU per recipe step (remat'd graphs count their
recomputation FLOPs — that IS the executed work).

Run: `python -m tools.vit_bench [section ...]` (default: embed mae dinov2).
Timing: bench.py methodology — in-jit lax.scan with a data dependency,
fixed overhead removed by differencing two iteration counts (the axon
relay's block_until_ready does not block; CLAUDE.md).

Reference surfaces matched: `/root/reference/src/models_vit.py:26-270`
(ViT forward), `/root/reference/HairPretraining/src/pretrain_engine.py:
402-512` (DINOv2 loop), `:602-757` (SHAM loop).
"""
from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hairci.ssl import build_recipe

BATCH = 256
# the max this chip has measurably sustained on an isolated bf16 conv/matmul
# (tools/fused_conv_bn_bench.py, r2)
OBSERVED_SUSTAIN_FLOPS = 122e12
V5E_PEAK_FLOPS = 197e12


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


def compiled_flops(fn, *args) -> float:
    """FLOPs of one call from XLA's compiled-HLO cost analysis."""
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception as e:  # relay AOT may not expose cost analysis
        print(f"  cost_analysis unavailable: {e}", file=sys.stderr)
        return float("nan")


def bench_embed(recipe, images, batch, label="", flops=False):
    from hairci.aug.pipelines import knn_transform

    state = recipe.create_state(jax.random.key(0), images[:8])

    def features(state, x):
        # module-level extract_features on an already-transformed batch —
        # the recipe-level wrapper re-applies knn_transform, which would
        # both double-normalize and re-run the transform inside every
        # timed iteration (advisor r3)
        variables = {"params": state.params}
        if getattr(state, "batch_stats", None):
            variables["batch_stats"] = state.batch_stats
        return recipe.module.apply(variables, x, train=False,
                                   method=recipe.module.extract_features)

    @partial(jax.jit, static_argnames="iters")
    def loop(state, imgs, iters):
        x0 = knn_transform(imgs)

        def body(carry, _):
            feats = features(state, x0 + carry * 0.0)
            return jnp.sum(feats.astype(jnp.float32)), ()

        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return carry

    def run(it):
        return float(loop(state, images, it))

    per = timed(run, 2, 12)
    ips = batch / per
    line = f"{label}: {ips:.1f} img/s/chip"
    if flops:
        x0 = jax.jit(knn_transform)(images)
        f = compiled_flops(features, state, x0)
        if f == f:  # not NaN
            tf = f / per / 1e12
            line += (f"  [{f/batch/1e9:.1f} GFLOP/img compiled; {tf:.1f} TF/s"
                     f" = {tf*1e12/OBSERVED_SUSTAIN_FLOPS:.2f} of measured"
                     f" sustain, {tf*1e12/V5E_PEAK_FLOPS:.2f} of v5e peak]")
    print(line)
    return ips


def bench_train(recipe, images, batch, label="", flops=False, **step_kw):
    # full-batch init: SHAM sizes its persistent neg_indices cache from the
    # sample batch, and the mined-stage gather must match the step batch
    state = recipe.create_state(jax.random.key(0), images)

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

    per = timed(run, 1, 5)
    ips = batch / per
    line = f"{label}: {ips:.1f} img/s/chip"
    if flops:
        def one_step(state, imgs):
            st, m = recipe.train_step(state, {"image": imgs},
                                      jax.random.key(0), **step_kw)
            return m["loss"]

        f = compiled_flops(one_step, state, images)
        if f == f:
            tf = f / per / 1e12
            line += (f"  [{f/batch/1e9:.1f} GFLOP/img compiled; {tf:.1f} TF/s"
                     f" = {tf*1e12/OBSERVED_SUSTAIN_FLOPS:.2f} of measured"
                     f" sustain]")
    print(line)
    return ips


# ---------------------------------------------------------------------------
# embed decomposition: isolated components at the model's exact shapes
# (same approach as the r2 BN-reduce investigation, tools/bn_stats_bench.py)
# ---------------------------------------------------------------------------

def _measure_component(label, fn, args, per_fwd=1):
    @partial(jax.jit, static_argnames="iters")
    def loop(x, *rest, iters):
        def body(carry, _):
            out = fn(x + carry.astype(x.dtype) * 0, *rest)
            return jnp.sum(out.astype(jnp.float32)), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    def run(it):
        return float(loop(*args, iters=it))

    per = timed(run, 2, 12)
    print(f"{label}: {per*1e3:.2f} ms  (x{per_fwd} per forward = "
          f"{per*per_fwd*1e3:.1f} ms)")
    return per * per_fwd


def section_decomp(images):
    """ViT-B/16 embed cost decomposition at bs 256: each component timed in
    isolation at its exact in-model shape; the sum is compared against the
    measured full forward (gaps = fusion/overlap effects)."""
    import flax.linen as fnn

    B, N, D, H = BATCH, 197, 768, 12
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    x_tok = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32), bf)
    q = jnp.asarray(rng.normal(size=(B, H, N, D // H)).astype(np.float32), bf)
    x_img = jnp.asarray(rng.normal(size=(B, 224, 224, 3)).astype(np.float32),
                        bf)

    w_qkv = jnp.asarray(rng.normal(size=(D, 3 * D)).astype(np.float32) * 0.02,
                        bf)
    w_fc1 = jnp.asarray(rng.normal(size=(D, 4 * D)).astype(np.float32) * 0.02,
                        bf)
    w_fc2 = jnp.asarray(rng.normal(size=(4 * D, D)).astype(np.float32) * 0.02,
                        bf)
    w_patch = jnp.asarray(
        rng.normal(size=(16, 16, 3, D)).astype(np.float32) * 0.02, bf)

    total = 0.0
    total += _measure_component(
        "patch embed conv 16x16/16", lambda x: jax.lax.conv_general_dilated(
            x, w_patch, (16, 16), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")), (x_img,))
    total += _measure_component(
        "qkv matmul (B*N,768)@(768,2304)",
        lambda x: jnp.einsum("bnd,df->bnf", x, w_qkv), (x_tok,), per_fwd=12)
    total += _measure_component(
        "attention core (scores+softmax+PV, bf16 scores)",
        lambda q: _attn_core(q, q, q), (q,), per_fwd=12)
    total += _measure_component(
        "proj matmul (B*N,768)@(768,768)",
        lambda x: jnp.einsum("bnd,de->bne", x, w_fc2[:D, :]), (x_tok,),
        per_fwd=12)
    from hairci.models.vit import gelu as model_gelu

    total += _measure_component(
        "mlp fc1+gelu+fc2",
        # model_gelu ties the GELU form to dtype (tanh approx in bf16) —
        # the shipped op mix, not the exact-erf form (advisor r3)
        lambda x: jnp.einsum(
            "bnh,hd->bnd",
            model_gelu(jnp.einsum("bnd,dh->bnh", x, w_fc1)), w_fc2),
        (x_tok,), per_fwd=12)
    ln = fnn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
    ln_p = ln.init(jax.random.key(0), x_tok)
    total += _measure_component(
        "LayerNorm f32 (B,N,768)", lambda x: ln.apply(ln_p, x), (x_tok,),
        per_fwd=25)
    print(f"component sum: {total*1e3:.1f} ms/batch "
          f"(compare against the measured full embed)")


def _attn_core(q, k, v):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=q.dtype) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def main(argv):
    global BATCH
    argv = list(argv)
    if "--batch" in argv:
        i = argv.index("--batch")
        BATCH = int(argv[i + 1])
        del argv[i:i + 2]
    sections = argv or ["embed", "mae", "dinov2"]
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (BATCH, 224, 224, 3), dtype=np.uint8))

    if "embed" in sections:
        vit = build_recipe("mae", backbone="vit_base_patch16", img_size=224,
                           dtype=jnp.bfloat16)
        bench_embed(vit, images, BATCH, label="ViT-B/16 embed", flops=True)

    if "decomp" in sections:
        section_decomp(images)

    if "mae" in sections:
        vit = build_recipe("mae", backbone="vit_base_patch16", img_size=224,
                           dtype=jnp.bfloat16)
        bench_train(vit, images, BATCH,
                    label="MAE pretrain step (mask 0.75, depth-8 decoder)",
                    flops=True)

    REMATS = {"full-remat": True, "half-remat": "half",
              "selective-remat": "selective"}

    def _remat_list(default=("full-remat", "half-remat", "selective-remat")):
        picked = [s for s in sections if s in REMATS]
        return picked or list(default)

    if "dinov2" in sections:
        for remat in _remat_list():
            try:
                dino = build_recipe(
                    "dinov2", backbone="vit_base_patch16", img_size=224,
                    dtype=jnp.bfloat16, remat=REMATS[remat])
                bench_train(dino, images, BATCH,
                            label=f"DINOv2 step [{remat}]",
                            flops=remat == "full-remat")
            except Exception as e:
                print(f"DINOv2 step [{remat}]: FAILED "
                      f"({type(e).__name__}: {str(e)[:200]})")

    if "sham" in sections:
        for remat in _remat_list():
            try:
                sham = build_recipe(
                    "SHAM", backbone="vit_b_16", img_size=224,
                    dtype=jnp.bfloat16, num_batches=1, remat=REMATS[remat])
                bench_train(sham, images, BATCH,
                            label=f"SHAM mined step ViT-B [{remat}]",
                            flops=remat == "full-remat",
                            stage="mined", batch_id=0)
            except Exception as e:
                print(f"SHAM mined step ViT-B [{remat}]: FAILED "
                      f"({type(e).__name__}: {str(e)[:200]})")

    if "siameseim" in sections:
        sim = build_recipe("siameseim", backbone="vit_base_patch16",
                           img_size=224, dtype=jnp.bfloat16)
        bench_train(sim, images, BATCH, label="SiameseIM step", flops=True)

    if "simclr50" in sections:
        # ResNet-50 SimCLR step with a compiled-FLOP count — cross-checks
        # bench.py's SIMCLR_STEP_FLOPS constant (6.3e12 from the r1 HLO
        # conv inventory) against XLA's own accounting
        r50 = build_recipe("simclr", backbone="resnet50", img_size=224,
                           dtype=jnp.bfloat16)
        bench_train(r50, images, BATCH, label="SimCLR RN50 step",
                    flops=True)

    if "sham50" in sections:
        sham50 = build_recipe("SHAM", backbone="resnet50", img_size=224,
                              dtype=jnp.bfloat16, num_batches=1)
        bench_train(sham50, images, BATCH, label="SHAM mined step RN50",
                    flops=True, stage="mined", batch_id=0)

    if "face" in sections:
        from hairci.retrieval.encoders import FaceEncoder

        enc = FaceEncoder(model_name="VIT")
        imgs112 = jnp.asarray(
            rng.integers(0, 256, (BATCH, 112, 112, 3), dtype=np.uint8))

        @partial(jax.jit, static_argnames="iters")
        def loop(params, imgs, iters):
            def body(carry, _):
                f = enc._embed_fn(params,
                                  imgs + (carry * 0).astype(imgs.dtype))
                return jnp.sum(f.astype(jnp.float32)), ()

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c

        def run(it):
            return float(loop(enc.params, imgs112, it))

        per = timed(run, 2, 12)
        print(f"ViT-face embed (112px): {BATCH/per:.1f} img/s/chip")


if __name__ == "__main__":
    main(sys.argv[1:])
