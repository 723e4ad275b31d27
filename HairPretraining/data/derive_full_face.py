#!/usr/bin/env python
"""Derive full-face CSVs from hair-crop CSVs — parity with
`/root/reference/HairPretraining/data/test.py:1-18`:
`NNNNNN_hair.png` ids → `NNNNNN.jpg`.

Usage: python HairPretraining/data/derive_full_face.py \
           --train data_train.csv --test data_test.csv
"""

from __future__ import annotations

import argparse
import os

import pandas as pd


def derive(path: str, out_path: str) -> pd.DataFrame:
    df = pd.read_csv(path)
    df["id"] = df["id"].map(lambda s: f"{s[:-9]}.jpg")  # strip "_hair.png"
    df.to_csv(out_path, index=False)
    return df


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--train", default="data_train.csv")
    p.add_argument("--test", default="data_test.csv")
    p.add_argument("--out_dir", default=None)
    args = p.parse_args(argv)
    out = args.out_dir or os.path.dirname(args.train) or "."
    df = derive(args.train, os.path.join(out, "data_train_full_face.csv"))
    derive(args.test, os.path.join(out, "data_test_full_face.csv"))
    print(df.head())


if __name__ == "__main__":
    main()
