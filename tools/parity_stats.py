"""Seed-mean +- CI comparison for the headline-scale trained-parity runs
(VERDICT r4 #2): reduce the seed-noise blocker by (a) n_test >= 4096
queries (binomial 1-sigma floor ~0.55 pp at p~0.15) and (b) comparing
seed MEANS with a CI instead of single matched-seed runs.

Reads docs/parity_r5/{torch,jax}_s*.json (written by
tools/accuracy_parity.py at the matched config: resnet50 @112px, bs 64,
24 epochs / 4 warmup, n_train 512, n_test 4096, matched init) and prints
the mean-difference row with a Welch CI, plus the best resolvable bound
at this scale if the CI cannot call the reference's 0.5 % band
(`/root/reference/HairPretraining/src/classification_engine.py:71-98` is
the eval protocol both sides mirror).

Run: python -m tools.parity_stats [--dir docs/parity_r5]
"""
from __future__ import annotations

import argparse
import glob
import json
import math
import os


def load_side(dirname: str, side: str) -> dict[int, float]:
    out = {}
    for path in sorted(glob.glob(os.path.join(dirname, f"{side}_s*.json"))):
        with open(path) as fh:
            d = json.load(fh)
        key = "torch_top1" if "torch_top1" in d else "hairci_top1"
        if key not in d:  # partial/failed run
            continue
        out[d["config"]["seed"]] = float(d[key])
    return out


def mean_std(xs: list[float]) -> tuple[float, float]:
    m = sum(xs) / len(xs)
    if len(xs) < 2:
        return m, float("nan")
    var = sum((x - m) ** 2 for x in xs) / (len(xs) - 1)
    return m, math.sqrt(var)


# two-sided 95% t critical values for small dof (Welch dof floored to int)
T95 = {1: 12.71, 2: 4.30, 3: 3.18, 4: 2.78, 5: 2.57, 6: 2.45, 7: 2.36,
       8: 2.31, 9: 2.26, 10: 2.23}


def welch(a: list[float], b: list[float]):
    """(mean_diff, half-width of the 95% CI, dof) for mean(a) - mean(b)."""
    ma, sa = mean_std(a)
    mb, sb = mean_std(b)
    va, vb = sa ** 2 / len(a), sb ** 2 / len(b)
    se = math.sqrt(va + vb)
    if se == 0 or math.isnan(se):
        return ma - mb, float("nan"), 0
    dof = (va + vb) ** 2 / (
        va ** 2 / max(len(a) - 1, 1) + vb ** 2 / max(len(b) - 1, 1))
    t = T95.get(max(int(dof), 1), 1.96)
    return ma - mb, t * se, dof


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "parity_r5"))
    p.add_argument("--band", type=float, default=0.005,
                   help="reference parity band (0.5%% of top-1)")
    args = p.parse_args(argv)

    torch = load_side(args.dir, "torch")
    hairci = load_side(args.dir, "jax")
    print(f"torch seeds:  { {k: round(v, 4) for k, v in torch.items()} }")
    print(f"hairci seeds: { {k: round(v, 4) for k, v in hairci.items()} }")
    if not torch or not hairci:
        print("insufficient data (need >=1 seed per side)")
        return 1

    for side, vals in (("torch", torch), ("hairci", hairci)):
        m, s = mean_std(list(vals.values()))
        print(f"{side}: mean {m:.4f}  sd {s:.4f}  n {len(vals)}")

    diff, half, dof = welch(list(hairci.values()), list(torch.values()))
    print(f"\nmean(hairci) - mean(torch) = {diff*100:+.2f} pp "
          f"+- {half*100:.2f} pp (95% Welch CI, dof~{dof:.1f})")

    matched = sorted(set(torch) & set(hairci))
    if matched:
        deltas = [hairci[s] - torch[s] for s in matched]
        md, ms = mean_std(deltas)
        print(f"matched-seed deltas ({matched}): "
              f"{[f'{d*100:+.2f}pp' for d in deltas]}  mean {md*100:+.2f} pp")

    lo, hi = diff - half, diff + half
    band = args.band
    if math.isnan(half):
        print("verdict: CI undefined (single seed on a side)")
    elif lo > band:
        print(f"verdict: hairci ABOVE the +{band*100:.1f} pp band "
              "(no deficit; surplus is acceptable for parity-or-better)")
    elif hi < -band:
        print(f"verdict: hairci BELOW the -{band*100:.1f} pp band — "
              "genuine deficit")
    elif -band <= lo and hi <= band:
        print(f"verdict: INSIDE the +-{band*100:.1f} pp band")
    else:
        print(f"verdict: unresolved at this scale — best resolvable bound "
              f"is [{lo*100:+.2f}, {hi*100:+.2f}] pp vs the "
              f"+-{band*100:.1f} pp band; no evidence of deficit"
              if lo > -band else
              f"verdict: unresolved — CI [{lo*100:+.2f}, {hi*100:+.2f}] pp "
              f"straddles the band")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
