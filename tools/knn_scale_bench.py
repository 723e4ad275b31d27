"""Scale-proof of the kNN eval protocol at the reference's real shape.

The reference's kNN evaluation (`/root/reference/HairPretraining/src/
classification_engine.py:71-98`) runs sklearn KNeighborsClassifier over a
103,945-row training gallery (`data/data_train.csv`) against a 6,088-row
test split (`data_test_combination3.csv`) for every k in {5,10,20,27,30,
40,642}, 61 classes. r2's parity tests proved sklearn-equivalence at toy
scale only; this tool proves the protocol at the full shape:

  tpu      synthetic class-clustered gallery at N=103,945 x D=2048 (the
           resnet50 feature width), Q=6,088 — runs `hairci.eval.knn.
           knn_eval` end-to-end on the real TPU (wall-clock upper bound +
           no-OOM proof + device memory stats), then times the per-queryset
           compute honestly with the in-jit lax.scan differencing harness
           (the axon relay's block_until_ready does not block; CLAUDE.md).
  sklearn  same shapes on CPU: hairci `knn_predict` vs sklearn
           KNeighborsClassifier(metric="cosine") prediction equality at
           k=5 and k=642 over a query subsample (full Q at D=2048 is
           hours of sklearn time; the chunked math is query-row
           independent so a row subsample proves the same code path).

Run: `python -m tools.knn_scale_bench tpu` (TPU) /
     `python -m tools.knn_scale_bench sklearn` (forces the CPU backend
     itself — the JAX_PLATFORMS env var is overridden by sitecustomize).
"""
from __future__ import annotations

import argparse
import sys
import time
from functools import partial

import numpy as np

N_GALLERY = 103_945   # reference data_train.csv rows
N_QUERY = 6_088       # reference data_test_combination3.csv rows
DIM = 2048            # resnet50 pooled feature width
NUM_CLASSES = 61      # distinct labels in data_train.csv
KS = (5, 10, 20, 27, 30, 40, 642)  # classification_engine.py:82


def make_features(n, d, c, seed):
    """Class-clustered unit-norm features: accuracy is non-trivial (not
    chance, not 1.0), so vote paths with real ties get exercised."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, c, n).astype(np.int32)
    centers = rng.normal(size=(c, d)).astype(np.float32)
    feats = centers[labels] + 3.0 * rng.normal(size=(n, d)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    return feats, labels


def run_tpu(args):
    import jax
    import jax.numpy as jnp

    from hairci.eval.knn import (knn_eval, _knn_predict_chunk,
                                 _knn_predict_multi_chunk)

    print(f"devices: {jax.devices()}", file=sys.stderr)
    gal, gal_y = make_features(args.n, args.d, NUM_CLASSES, 0)
    qry, qry_y = make_features(args.q, args.d, NUM_CLASSES, 1)

    # 1) the real engine end-to-end: proves the full protocol (7 ks incl.
    # k=642, chunked host loop) completes at reference scale without OOM.
    t0 = time.perf_counter()
    results = knn_eval(gal, gal_y, qry, qry_y, ks=KS)
    wall = time.perf_counter() - t0
    for k in KS:
        print(f"k={k}: accuracy={results[k]['accuracy']:.4f}")
    print(f"knn_eval wall-clock (all {len(KS)} ks, relay-dispatch upper "
          f"bound): {wall:.1f}s")

    dev = jax.devices()[0]
    try:
        stats = dev.memory_stats()
        peak = stats.get("peak_bytes_in_use", 0) / 2**30
        limit = stats.get("bytes_limit", 0) / 2**30
        print(f"device memory: peak {peak:.2f} GiB, limit {limit:.2f} GiB")
    except Exception as e:
        print(f"memory_stats unavailable on this backend: {e}",
              file=sys.stderr)

    # 2) honest compute time for one full query set at one k: in-jit scan
    # over host-chunk-equivalent slices with a data dependency between
    # iterations, differencing two iteration counts to drop fixed overhead.
    gal_j = jnp.asarray(gal)
    gal_yj = jnp.asarray(gal_y)
    chunk = 4096
    pad = (-args.q) % chunk
    qry_p = jnp.asarray(np.pad(qry, ((0, pad), (0, 0))))
    qry_c = qry_p.reshape(-1, chunk, args.d)

    for k in (5, 642):
        @partial(jax.jit, static_argnames="iters")
        def loop(qc, g, gy, iters, k=k):
            def body(carry, _):
                def inner(acc, q):
                    p = _knn_predict_chunk(
                        q + carry.astype(q.dtype) * 0, g, gy, k, NUM_CLASSES)
                    return acc + jnp.sum(p), None
                acc, _ = jax.lax.scan(inner, jnp.int32(0), qc)
                return jnp.float32(acc), ()

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c

        def run(it):
            return float(loop(qry_c, gal_j, gal_yj, iters=it))

        for it in (2, 8):
            t0 = time.perf_counter()
            run(it)
            print(f"  [k={k}] compile+run iters={it}: "
                  f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
        ts = min(_t(run, 2) for _ in range(2))
        tl = min(_t(run, 8) for _ in range(2))
        per = (tl - ts) / 6
        flops = 2.0 * args.q * args.n * args.d
        print(f"query-set compute k={k}: {per*1e3:.1f} ms "
              f"({per*1e3/args.q:.3f} ms/query, sims matmul "
              f"{flops/per/1e12:.1f} TF/s)")

    # 3) the multi-k kernel: ALL 7 reference ks over one shared sims +
    # top_k(642) pass per chunk (what knn_eval now runs) — vs the per-k
    # protocol's sum of 7 separate passes measured above.
    @partial(jax.jit, static_argnames="iters")
    def loop_multi(qc, g, gy, iters):
        def body(carry, _):
            def inner(acc, q):
                ps = _knn_predict_multi_chunk(
                    q + carry.astype(q.dtype) * 0, g, gy, KS, NUM_CLASSES)
                return acc + sum(jnp.sum(p) for p in ps), None
            acc, _ = jax.lax.scan(inner, jnp.int32(0), qc)
            return jnp.float32(acc), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    def run_multi(it):
        return float(loop_multi(qry_c, gal_j, gal_yj, iters=it))

    for it in (2, 8):
        t0 = time.perf_counter()
        run_multi(it)
        print(f"  [multi-k {KS}] compile+run iters={it}: "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
    ts = min(_t(run_multi, 2) for _ in range(2))
    tl = min(_t(run_multi, 8) for _ in range(2))
    per = (tl - ts) / 6
    print(f"query-set compute, ALL ks {KS} shared pass: {per*1e3:.1f} ms "
          f"({per*1e3/args.q:.3f} ms/query/all-ks)")


def _t(run, it):
    t0 = time.perf_counter()
    run(it)
    return time.perf_counter() - t0


def run_topk(args):
    """Probe: is `lax.top_k` (O(N*k), dominates at k=642) beatable by a
    full descending sort (O(N log^2 N) bitonic on TPU) or by
    `lax.approx_max_k` with exact rescoring? Timed on the real sims-matrix
    shape (chunk=4096 queries x N gallery) with the in-jit differencing
    harness. Informs `_knn_predict_multi_chunk`'s kmax path."""
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", file=sys.stderr)
    chunk, n, k = 4096, args.n, 642

    @jax.jit
    def make():
        s = jax.random.normal(jax.random.key(0), (chunk, n), jnp.float32)
        return s

    sims = make()

    variants = {
        "lax.top_k(642)": lambda s: jax.lax.top_k(s, k)[1],
        "argsort-desc[:642]": lambda s: jnp.argsort(-s, axis=1)[:, :k],
        "sort_key_val[:642]": lambda s: jax.lax.sort_key_val(
            -s, jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), s.shape),
        )[1][:, :k],
    }
    for name, fn in variants.items():
        @partial(jax.jit, static_argnames="iters")
        def loop(s, iters, fn=fn):
            def body(carry, _):
                idx = fn(s + carry * 0)
                return jnp.float32(jnp.sum(idx)), ()

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c

        def run(it):
            return float(loop(sims, iters=it))

        try:
            for it in (2, 8):
                t0 = time.perf_counter()
                run(it)
                print(f"  [{name}] compile+run iters={it}: "
                      f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
            ts = min(_t(run, 2) for _ in range(2))
            tl = min(_t(run, 8) for _ in range(2))
            per = (tl - ts) / 6
            print(f"top-{k} over ({chunk}, {n}): {name}: {per*1e3:.1f} ms")
        except Exception as e:
            print(f"top-{k} {name}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:160]})")


def run_sklearn(args):
    # sitecustomize pins JAX_PLATFORMS=axon at interpreter start, so the
    # env var alone does NOT give a CPU backend — config.update before any
    # backend use is required (CLAUDE.md). On the axon TPU this comparison
    # would silently measure TPU matmul rounding instead of the code path.
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()

    from sklearn.neighbors import KNeighborsClassifier

    from hairci.eval.knn import knn_predict

    gal, gal_y = make_features(args.n, args.d, NUM_CLASSES, 0)
    qry, _ = make_features(args.q, args.d, NUM_CLASSES, 1)
    sub = qry[:args.sk_queries]
    for k in (5, 642):
        t0 = time.perf_counter()
        ours = knn_predict(gal, gal_y, sub, k, NUM_CLASSES)
        t_ours = time.perf_counter() - t0
        t0 = time.perf_counter()
        clf = KNeighborsClassifier(n_neighbors=k, metric="cosine")
        clf.fit(gal, gal_y)
        ref = clf.predict(sub)
        t_sk = time.perf_counter() - t0
        mism = np.flatnonzero(ours != ref)
        print(f"k={k}: {len(sub)-len(mism)}/{len(sub)} predictions match "
              f"sklearn (hairci {t_ours:.1f}s cpu, sklearn {t_sk:.1f}s)")
        # At 103,945 rows the k-th / (k+1)-th neighbor similarities can
        # differ by less than the f32 dot-product rounding error
        # (~sqrt(D)*eps for unit rows), and sklearn's pairwise kernel and
        # our einsum sum in different orders — the boundary neighbor (and
        # hence the vote) is then ill-defined at f32. Adjudicate each
        # mismatch in f64: it only counts as a REAL divergence if the
        # boundary gap exceeds f32 numeric resolution.
        tol = np.sqrt(args.d) * np.finfo(np.float32).eps * 8  # ~9e-6
        for i in mism:
            sims = gal.astype(np.float64) @ sub[i].astype(np.float64)
            srt = np.sort(sims)[::-1]
            gap = float(srt[k - 1] - srt[k])
            print(f"  query {i}: ours={ours[i]} sklearn={ref[i]} "
                  f"boundary gap={gap:.2e} "
                  f"({'f32 tie' if gap < tol else 'REAL divergence'})")
            assert gap < tol, (
                f"k={k} query {i}: predictions differ and the f64 boundary "
                f"gap {gap:.2e} exceeds f32 resolution {tol:.2e}")
    print("sklearn parity at reference scale: OK "
          "(all mismatches adjudicated as f32 boundary ties)")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["tpu", "sklearn", "topk"])
    p.add_argument("--n", type=int, default=N_GALLERY)
    p.add_argument("--q", type=int, default=N_QUERY)
    p.add_argument("--d", type=int, default=DIM)
    p.add_argument("--sk_queries", type=int, default=512,
                   help="query rows compared against sklearn (row-"
                        "independent math; subsample keeps sklearn <10min)")
    args = p.parse_args(argv)
    if args.mode == "tpu":
        run_tpu(args)
    elif args.mode == "topk":
        run_topk(args)
    else:
        run_sklearn(args)


if __name__ == "__main__":
    main()
