#!/usr/bin/env python
"""Builds a small synthetic hair-crop dataset (images + CSV manifests +
full/hair pairs) for smoke-testing every pipeline without CelebA."""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--classes", type=int, default=8)
    p.add_argument("--size", type=int, default=128)
    args = p.parse_args(argv)

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
    print(f"wrote {args.n} pairs to {args.out}")


if __name__ == "__main__":
    main()
