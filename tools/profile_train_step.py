"""Capture a jax.profiler device trace of the SimCLR train step on the real
TPU and tabulate per-op-category time from the trace protos.

Usage: python tools/profile_train_step.py [outdir]
Prints the top XLA ops by total device time. Works through the axon relay
(the profiler plumbs through; see BENCH_RESULTS.md history).
"""

from __future__ import annotations

import glob
import gzip
import os
import sys
from collections import defaultdict
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 256


def capture(outdir: str) -> None:
    from hairci.ssl import build_recipe

    recipe = build_recipe("simclr", backbone="resnet50", img_size=224,
                          dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (BATCH, 224, 224, 3), dtype=np.uint8))
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

    print("warmup/compile...", file=sys.stderr)
    float(loop(state, images, 3))
    print("tracing...", file=sys.stderr)
    with jax.profiler.trace(outdir):
        float(loop(state, images, 3))
    print("trace captured", file=sys.stderr)


def tabulate(outdir: str, top: int = 30) -> None:
    # the trace.json.gz contains per-op device events
    paths = glob.glob(os.path.join(
        outdir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace found under", outdir)
        return
    import json

    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur")]
    # keep only TPU op-level lanes (XLA Ops), not host threads
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in trace["traceEvents"]
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    op_pids = {p for p, n in pid_names.items()
               if "TPU" in n or "XLA Ops" in n or "/device:" in n}
    by_name = defaultdict(float)
    for e in events:
        if op_pids and e.get("pid") not in op_pids:
            continue
        by_name[e["name"]] += e["dur"]  # microseconds
    total = sum(by_name.values())
    print(f"\ntotal device op time: {total/1e3:.1f} ms "
          f"({len(by_name)} distinct ops)")
    for name, us in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{us/1e3:9.2f} ms  {name[:110]}")
    # rollup by category
    cats = defaultdict(float)
    for name, us in by_name.items():
        key = name.split(".")[0].split("-")[0]
        cats[key] += us
    print("\nby category:")
    for name, us in sorted(cats.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{us/1e3:9.2f} ms  {name}")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hairci_trace"
    capture(outdir)
    tabulate(outdir)
