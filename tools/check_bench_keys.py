"""Guard against silent bench-budget blowouts (VERDICT r4 #1/#6): the
driver's ``BENCH_r{N}.json`` is the round's scoreboard, and in round 4 it
recorded only 1 of 7 sections after an 853 s cold compile — discovered by
the judge, not at round close. This checker asserts a driver bench
artifact carries every headline key `bench.py` is contracted to emit.

Usage:
    python -m tools.check_bench_keys            # newest BENCH_r*.json, r>=5
    python -m tools.check_bench_keys FILE.json  # explicit artifact

Rounds 1-4 predate the persistent-compilation-cache + watchdog bench and
are grandfathered (their gaps are already documented in VERDICT.md);
`tests/test_bench_keys.py` wires this into the suite so a gapped artifact
fails the next `pytest` run loudly.
"""
from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Every key bench.py must land in the driver JSON (VERDICT r4 #1 "Done"
# list). The *_mfu_* extras are quality-of-reporting, not gated here: they
# legitimately degrade to absent only if the relay hides cost_analysis AND
# the committed fallbacks are removed.
REQUIRED_TOP = ("metric", "value", "unit", "vs_baseline", "extra")
REQUIRED_EXTRA = (
    "simclr_train_images_per_sec_per_chip",
    "query_p50_ms_100k_gallery",
    "vit_embed_images_per_sec_per_chip",
    "sham_train_images_per_sec_per_chip",
    "knn_eval_ms_100k_k5",
    "knn_eval_ms_100k_all7ks",
)
GRANDFATHERED_THROUGH = 4


def check_payload(payload: dict) -> list[str]:
    """Missing-key report for one parsed bench JSON payload (the driver
    wraps it under "parsed"; a raw bench.py line is accepted too)."""
    parsed = payload.get("parsed", payload)
    problems = [f"missing top-level key: {k}" for k in REQUIRED_TOP
                if k not in parsed]
    if not isinstance(parsed.get("value"), (int, float)) or \
            parsed.get("value", 0) <= 0:
        problems.append(f"headline value not positive: {parsed.get('value')}")
    extra = parsed.get("extra") or {}
    problems += [f"missing extra key: {k}" for k in REQUIRED_EXTRA
                 if k not in extra]
    if problems and extra.get("bench_watchdog_cut"):
        problems.append(
            "note: artifact is watchdog-cut — bench.py emitted the "
            "JSON-so-far after a relay stall ate the budget (environment "
            "event, not a bench bug; see BENCH_RESULTS.md run D). Gaps "
            "above still gate: re-run `python bench.py` for a complete "
            "artifact.")
    return problems


def bench_artifacts() -> list[tuple[int, str]]:
    out = []
    for fn in os.listdir(ROOT):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", fn)
        if m:
            out.append((int(m.group(1)), os.path.join(ROOT, fn)))
    return sorted(out)


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv:
        targets = [(None, argv[0])]
    else:
        targets = [(n, p) for n, p in bench_artifacts()
                   if n > GRANDFATHERED_THROUGH]
        if not targets:
            newest = bench_artifacts()[-1][0] if bench_artifacts() else None
            print(f"no BENCH_r*.json newer than r{GRANDFATHERED_THROUGH} "
                  f"yet (newest: r{newest}) — nothing to check")
            return 0
    rc = 0
    for n, path in targets:
        with open(path) as fh:
            payload = json.load(fh)
        problems = check_payload(payload)
        tag = os.path.basename(path)
        if problems:
            rc = 1
            print(f"FAIL {tag}:")
            for p in problems:
                print(f"  - {p}")
        else:
            print(f"ok   {tag}: headline + {len(REQUIRED_EXTRA)} extra keys "
                  "present")
    return rc


if __name__ == "__main__":
    sys.exit(main())
