"""Microbenchmark: ViT-B/16 attention variants on the real TPU.

The r2 verdict flagged the ViT family as the last unanalyzed perf surface:
ViT-B embed runs ~31-60% of this chip's measured sustain depending on the
FLOP accounting, and the per-block (B, H, N, N) f32 score matrix
(256x12x197x197 f32 = 477 MB) is the one tensor XLA must materialize in
HBM per block. Variants measured at the model's exact shape
(B=256, H=12, N=197, d=64, bf16 q/k/v):

  xla_f32scores   what `hairci.models.vit.Attention` ships: f32 scores
                  einsum + f32 softmax + bf16 probs into the PV einsum
                  (parity with the reference's fp16-overflow-guarded
                  softmax, /root/reference/HairPretraining/src/models_vit.py)
  xla_bf16scores  scores einsum emits bf16 (half the HBM write), softmax
                  still accumulates f32 via astype
  flash_pad256    jax.experimental.pallas.ops.tpu.flash_attention, N padded
                  197->256, pad keys masked via segment_ids; never
                  materializes the score matrix in HBM
  jnn_dpa         jax.nn.dot_product_attention (implementation=None -> the
                  XLA composed path on TPU; the cudnn kernel is GPU-only) —
                  measures whether jax's canonical attention entry point
                  lowers any better than our hand-written einsum pair

Run: `python tools/attn_bench.py` (real TPU; in-jit lax.scan differencing
harness — axon relay's block_until_ready does not block, CLAUDE.md).
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas.ops.tpu import flash_attention as fa

B, H, N, D = 256, 12, 197, 64
NPAD = 256
SCALE = D**-0.5


def xla_attn(q, k, v, scores_dtype=jnp.float32):
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=scores_dtype) * SCALE
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def flash_attn(q, k, v):
    pad = [(0, 0), (0, 0), (0, NPAD - N), (0, 0)]
    qp, kp, vp = (jnp.pad(t, pad) for t in (q, k, v))
    seg = jnp.concatenate(
        [jnp.zeros((B, N), jnp.int32), jnp.ones((B, NPAD - N), jnp.int32)],
        axis=1)
    out = fa.flash_attention(qp, kp, vp,
                             segment_ids=fa.SegmentIds(q=seg, kv=seg),
                             sm_scale=SCALE)
    return out[:, :, :N, :]


def jnn_dpa(q, k, v):
    # jax.nn.dot_product_attention wants BTNH (batch, seq, heads, head_dim)
    qt, kt, vt = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
    out = jax.nn.dot_product_attention(qt, kt, vt, scale=SCALE)
    return jnp.swapaxes(out, 1, 2)


def measure(name, fn, args, small=2, large=12, repeats=2, fwd_bwd=False):
    if fwd_bwd:
        def step(*a):
            def loss(*a):
                return jnp.sum(fn(*a).astype(jnp.float32))
            l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(*a)
            return l + sum(jnp.sum(g.astype(jnp.float32)) for g in grads)
    else:
        def step(*a):
            return jnp.sum(fn(*a).astype(jnp.float32))

    @partial(jax.jit, static_argnames="iters")
    def loop(q, k, v, iters):
        def body(carry, _):
            return step(q + carry.astype(q.dtype) * 0, k, v), ()

        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return carry

    def run(it):
        return float(loop(*args, iters=it))

    for it in (small, large):
        t0 = time.perf_counter()
        run(it)
        print(f"  [{name}] compile+run iters={it}: "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
    ts = min(_t(run, small) for _ in range(repeats))
    tl = min(_t(run, large) for _ in range(repeats))
    per = max((tl - ts) / (large - small), 1e-9)
    flops = 2 * 2 * B * H * N * N * D * (3.5 if fwd_bwd else 1)
    print(f"{name}{' fwd+bwd' if fwd_bwd else ' fwd'}: {per*1e3:.2f} ms  "
          f"({flops/per/1e12:.1f} TF/s on the 2*N^2*D matmul pair)")
    return per


def _t(run, it):
    t0 = time.perf_counter()
    run(it)
    return time.perf_counter() - t0


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32),
                           dtype=jnp.bfloat16) for _ in range(3))

    # correctness: flash vs the f32-scores reference path
    ref = jax.jit(xla_attn)(q, k, v)
    fl = jax.jit(flash_attn)(q, k, v)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                fl.astype(jnp.float32))))
    print(f"flash vs xla max|diff| = {err:.2e}", file=sys.stderr)
    assert err < 2e-2, err
    bf = jax.jit(partial(xla_attn, scores_dtype=jnp.bfloat16))(q, k, v)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                bf.astype(jnp.float32))))
    print(f"bf16-scores vs f32-scores max|diff| = {err:.2e}", file=sys.stderr)
    dpa = jax.jit(jnn_dpa)(q, k, v)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                dpa.astype(jnp.float32))))
    print(f"jnn_dpa vs f32-scores max|diff| = {err:.2e}", file=sys.stderr)
    assert err < 2e-2, err

    for fwd_bwd in (False, True):
        measure("xla_f32scores", xla_attn, (q, k, v), fwd_bwd=fwd_bwd)
        measure("xla_bf16scores",
                partial(xla_attn, scores_dtype=jnp.bfloat16), (q, k, v),
                fwd_bwd=fwd_bwd)
        measure("flash_pad256", flash_attn, (q, k, v), fwd_bwd=fwd_bwd)
        measure("jnn_dpa", jnn_dpa, (q, k, v), fwd_bwd=fwd_bwd)


if __name__ == "__main__":
    main()
