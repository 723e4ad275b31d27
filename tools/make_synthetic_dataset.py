#!/usr/bin/env python
"""Builds a small synthetic hair-crop dataset (images + CSV manifests +
full/hair pairs) for smoke-testing every pipeline without CelebA."""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def write_benchmark_manifests(out: str) -> None:
    """Derive figaro_* / k_hairstyle_* sample manifests from the existing
    data_{train,test}.csv in ``out``.

    The reference's classification scripts reference
    ``figaro_{training,testing}.csv`` and the k-hairstyle benchmark's
    ``{training,testing}_classification_labels.csv``
    (e.g. /root/reference/HairPretraining/scripts/classification/figaro/knn_our.sh,
    .../k_hairstyle/knn_our.sh) but ships neither — SURVEY.md §2.1 "not
    present in repo". These sample stand-ins reuse the committed synthetic
    images with benchmark-shaped splits so every script runs out-of-box:
    figaro coarsens to 4 classes with a 75% split; k_hairstyle keeps all
    classes with an interleaved 3:1 split (written under both the
    reference's basenames and the descriptive ``k_hairstyle_*`` aliases).
    """
    rows = []
    for name in ("data_train.csv", "data_test.csv"):
        with open(os.path.join(out, name)) as f:
            rows += [ln.strip() for ln in f.readlines()[1:] if ln.strip()]
    rows.sort()  # by zero-padded stem → deterministic

    def _write(name, lines):
        with open(os.path.join(out, name), "w") as f:
            f.write("\n".join(["id,class"] + lines) + "\n")

    figaro = [f"{r.split(',')[0]},{int(r.split(',')[1]) % 4}" for r in rows]
    split = int(len(figaro) * 0.75)
    _write("figaro_training.csv", figaro[:split])
    _write("figaro_testing.csv", figaro[split:])
    kh_train = [r for i, r in enumerate(rows) if i % 4 != 3]
    kh_test = [r for i, r in enumerate(rows) if i % 4 == 3]
    _write("k_hairstyle_training.csv", kh_train)
    _write("k_hairstyle_testing.csv", kh_test)
    # the reference scripts' exact basenames
    _write("training_classification_labels.csv", kh_train)
    _write("testing_classification_labels.csv", kh_test)
    print(f"wrote figaro/k_hairstyle sample manifests to {out}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--classes", type=int, default=8)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--benchmarks_only", action="store_true",
                   help="only (re)derive figaro/k_hairstyle CSVs from the "
                        "existing data_{train,test}.csv in --out")
    args = p.parse_args(argv)
    if args.benchmarks_only:
        write_benchmark_manifests(args.out)
        return

    img_dir = os.path.join(args.out, "hair_regions")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    rows = ["id,class"]
    s = args.size
    for i in range(args.n):
        cls = i % args.classes
        # class-dependent "hairstyle": colored blob with class-specific hue
        full = np.zeros((s, s, 3), dtype=np.uint8)
        color = np.asarray([((cls * 37) % 200) + 55, ((cls * 91) % 200) + 55,
                            ((cls * 53) % 200) + 55])
        h = s // 3 + (cls % 3) * s // 8
        full[:h] = (color[None, None] * rng.uniform(0.6, 1.0, (h, s, 1))
                    ).astype(np.uint8)
        full[h:] = rng.integers(30, 220, (s - h, s, 3))
        hair = full.copy()
        hair[h:] = 0
        stem = f"{i:06d}"
        Image.fromarray(full).save(os.path.join(img_dir, f"{stem}.jpg"))
        Image.fromarray(hair).save(os.path.join(img_dir, f"{stem}_hair.png"))
        rows.append(f"{stem}_hair.png,{cls}")
    split = int(args.n * 0.8)
    with open(os.path.join(args.out, "data_train.csv"), "w") as f:
        f.write("\n".join(rows[:1] + rows[1:split + 1]) + "\n")
    with open(os.path.join(args.out, "data_test.csv"), "w") as f:
        f.write("\n".join(rows[:1] + rows[split + 1:]) + "\n")
    write_benchmark_manifests(args.out)
    print(f"wrote {args.n} pairs to {args.out}")


if __name__ == "__main__":
    main()
