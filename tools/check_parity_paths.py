"""Sanity-check PARITY.md / docs/MIGRATION.md / README.md: every `hairci/...`, `tools/...`, `scripts/...`
path or dotted `hairci.x.y` module it names must exist, and every
`module.py:symbol` style mention must resolve. Guards the inventory
against rot as the tree evolves. Run: `python -m tools.check_parity_paths`.
"""
from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


DOCS = ("PARITY.md", "docs/MIGRATION.md", "README.md")


def main() -> int:
    rc = 0
    for doc in DOCS:
        rc |= check_doc(doc)
    return rc


def check_doc(doc: str) -> int:
    text = open(os.path.join(ROOT, doc)).read()
    missing = []

    # path-like mentions: hairci/foo/bar.py, tools/x.py, scripts/y.sh ...
    for m in set(re.findall(
            r"`((?:hairci|tools|scripts|src|HairPretraining|Visualizer|"
            r"configs)/[\w/.\-]+?\.(?:py|sh|cpp|md|yaml))", text)):
        if not os.path.exists(os.path.join(ROOT, m)):
            missing.append(m)

    # module:symbol mentions like `aug/pipelines.py:knn_transform` or
    # `hairci/ops/topk_pallas.py` handled above; now `x/y.py:sym`
    for path, sym in set(re.findall(
            r"`((?:[\w/]+?)\.py):([A-Za-z_]\w*)`", text)):
        for base in ("", "hairci"):
            p = os.path.join(ROOT, base, path)
            if os.path.exists(p):
                src = open(p).read()
                if not re.search(
                        rf"(def|class)\s+{re.escape(sym)}\b|^{re.escape(sym)}\s*=",
                        src, re.M):
                    missing.append(f"{path}:{sym}")
                break
        else:
            missing.append(path)

    # test-file mentions (round-1 lesson: PARITY claimed a dryrun test that
    # didn't exist) — and `file.py:NNN` line citations must not point past
    # the end of the file
    for m in set(re.findall(r"`?(tests/[\w/.\-]+?\.py)", text)):
        if not os.path.exists(os.path.join(ROOT, m)):
            missing.append(m)
    for path, line in set(re.findall(
            r"`((?:hairci|tools|tests)/[\w/.\-]+?\.py):(\d+)", text)):
        p = os.path.join(ROOT, path)
        if os.path.exists(p):
            n_lines = sum(1 for _ in open(p))
            if int(line) > n_lines:
                missing.append(f"{path}:{line} (file has {n_lines} lines)")

    # dotted module mentions: hairci.a.b(.c)
    for mod in set(re.findall(r"`(hairci(?:\.\w+)+)", text)):
        rel = mod.replace(".", "/")
        if not (os.path.exists(os.path.join(ROOT, rel + ".py"))
                or os.path.isdir(os.path.join(ROOT, rel))):
            # maybe module.attr — strip last component
            rel2 = "/".join(rel.split("/")[:-1])
            if not (os.path.exists(os.path.join(ROOT, rel2 + ".py"))
                    or os.path.isdir(os.path.join(ROOT, rel2))):
                missing.append(mod)

    if missing:
        print(f"{doc} references missing targets:")
        for m in sorted(missing):
            print(f"  {m}")
        return 1
    print(f"{doc}: all referenced paths/symbols resolve.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
