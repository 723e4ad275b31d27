#!/usr/bin/env python
"""Gradio demo entry point — path parity with
/root/reference/HairPretraining/app/app.py. Requires gradio (not in this
image); the pipeline itself (hairci.serve.demo.DemoPipeline) is fully
testable without it."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_path", required=True)
    p.add_argument("--ckpt_path", default=None)
    p.add_argument("--index_dir", default="save/demo_index")
    p.add_argument("--share", action="store_true")
    args = p.parse_args()

    from hairci.retrieval.encoders import HairEncoder
    from hairci.serve.demo import DemoPipeline, launch_gradio

    pipeline = DemoPipeline(HairEncoder(args.ckpt_path), args.index_dir)
    pipeline.build_index(args.dataset_path)
    launch_gradio(pipeline, share=args.share)


if __name__ == "__main__":
    main()
