"""Quantitative retrieval evaluation — parity with
`/root/reference/experiments/DualViewHair/scripts/quantitative_eval.py:161-236`:
benchmark JSON → Recall@K + mAP@K (K ∈ {10, 20, 50}) + top-100 result JSON
in the Visualizer schema. The FAISS index is replaced by the on-device
GalleryIndex (one matmul + top-k).

CLI: python -m hairci.experiments.dualview.quantitative_eval \
        --db_path ... --benchmark ... --out log_json/model_top100_results.json
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from typing import Callable, Dict, List, Sequence

import numpy as np

from hairci.eval.retrieval_metrics import (
    load_benchmark,
    recall_map_at_k,
    save_top100_results,
)
from hairci.retrieval.index import GalleryIndex

log = logging.getLogger(__name__)


def evaluate(
    index: GalleryIndex,
    embed_query: Callable[[str], np.ndarray],
    benchmark: List[Dict],
    database_root: str,
    ks: Sequence[int] = (10, 20, 50),
    out_json: str = "log_json/dualviewhair_top100_results.json",
) -> Dict:
    """Runs the benchmark; query names are mapped `<x>.jpg → <x>_hair.png`
    like the reference (`quantitative_eval.py:170-171`)."""
    queries, retrieved, gts = [], [], []
    for item in benchmark:
        qname = os.path.basename(item["query_image"])[:-4] + "_hair.png"
        qpath = os.path.join(database_root, qname)
        if not os.path.exists(qpath):
            log.warning("missing query %s", qpath)
            continue
        gt = [os.path.basename(g)[:-4] + "_hair.png"
              for g in item["ground_truth"]]
        feat = embed_query(qpath)
        _, paths = index.search_paths(feat[None], max(100, max(ks)))
        names = [os.path.basename(p) for p in paths[0]]
        queries.append(qname)
        retrieved.append(names)
        gts.append(gt)
    results = recall_map_at_k(retrieved, gts, ks)
    save_top100_results(queries, retrieved, out_json)
    for k in ks:
        log.info("mAP@%d: %.4f  R@%d: %.4f", k, results["mAP"][k], k,
                 results["Recall"][k])
    return results


def _dualview_embedder(ckpt_path: str, encoder: str, size: int,
                       batch_size: int = 64, tower: str = "student"):
    """Build (index_fn, embed_query) over a trained DualViewHairModel
    checkpoint (reference `quantitative_eval_enhanced.py`: same harness,
    enhanced model instead of the MAE/SiameseIM ViT).

    ``tower`` defaults to the student (gradient-trained) encoder like the
    reference's feature extraction; with momentum 0.999 the EMA tower is
    near-init after short training and under-reports quality. ``--tower
    teacher`` evaluates the EMA copy instead."""
    import glob

    import jax
    import jax.numpy as jnp

    from hairci.data.loader import decode_image
    from hairci.experiments.dualview.models import DualViewHairModel
    from hairci.experiments.dualview.train import _teacher_aug
    from hairci.train.checkpoint import restore_checkpoint

    model = DualViewHairModel(encoder=encoder)
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    state = model.create_state(jax.random.key(0), dummy)
    if ckpt_path:
        state, _ = restore_checkpoint(ckpt_path, state)

    embed = jax.jit(lambda imgs: model.get_embeddings(
        state, _teacher_aug(imgs), use_teacher=(tower == "teacher")))

    def embed_query(path: str) -> np.ndarray:
        img = decode_image(path, "raw_resize", size)
        return np.asarray(embed(jnp.asarray(img[None])))[0]

    def build_index(db_path: str) -> GalleryIndex:
        paths = sorted(glob.glob(os.path.join(db_path, "*_hair.png")))
        if not paths:
            paths = sorted(glob.glob(os.path.join(db_path, "*")))
        embs = []
        for i in range(0, len(paths), batch_size):
            imgs = [decode_image(p, "raw_resize", size)
                    for p in paths[i:i + batch_size]]
            embs.append(np.asarray(embed(jnp.asarray(np.stack(imgs)))))
        return GalleryIndex(np.concatenate(embs), paths)

    return build_index, embed_query


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--db_path", required=True,
                   help="database image folder (hair crops)")
    p.add_argument("--benchmark", required=True, help="benchmark JSON")
    p.add_argument("--ckpt_path", default=None)
    p.add_argument("--embed_dir", default="save/dualview_embeddings")
    p.add_argument("--out", default="log_json/dualviewhair_top100_results.json")
    p.add_argument("--model", default="vit", choices=["vit", "dualview"],
                   help="vit = HairEncoder ckpt (quantitative_eval.py); "
                        "dualview = DualViewHairModel Orbax ckpt "
                        "(quantitative_eval_enhanced.py)")
    p.add_argument("--encoder", default="resnet",
                   choices=["resnet", "multiscale", "partbased"])
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--tower", default="student",
                   choices=["student", "teacher"],
                   help="which DualView tower embeds: student matches the "
                        "reference's feature extraction (default)")
    args = p.parse_args(argv)

    if args.model == "dualview":
        build_index, embed_query = _dualview_embedder(
            args.ckpt_path, args.encoder, args.size, tower=args.tower)
        index = build_index(args.db_path)
        bench = load_benchmark(args.benchmark)
        evaluate(index, embed_query, bench, args.db_path, out_json=args.out)
        return

    from hairci.retrieval.encoders import HairEncoder

    enc = HairEncoder(args.ckpt_path, batch_size=64)
    if enc.embeddings_exist(args.embed_dir):
        index = enc.load_embeddings(args.embed_dir)
    else:
        index = enc.extract_dataset_features(args.db_path, args.embed_dir)
    bench = load_benchmark(args.benchmark)
    evaluate(index, enc.encode_single_image, bench, args.db_path,
             out_json=args.out)


if __name__ == "__main__":
    main()
