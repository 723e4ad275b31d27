"""`knn_classification.py` — evaluation entry point, CLI-surface compatible
with `/root/reference/HairPretraining/knn_classification.py:43-199`:
per-mode checkpoint load → knn / linear_prob / visualization /
inter_intra_distance dispatch over the deterministic `knn_transform` loaders.

Checkpoints are hairci Orbax dirs (per-mode torch formats are replaced by
the uniform TrainState checkpoint; a torch-weight converter lives in
hairci/retrieval/torch_import.py for reference-trained weights).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from hairci.data import DataLoader, load_manifest
from hairci.eval.classifier import Classifier
from hairci.ssl import build_recipe
from hairci.train import checkpoint as ckpt_lib
from hairci.utils.config import merge_config_with_args
from hairci.utils.seeding import set_seed

EVAL_MODES = ["mae", "simclr", "simclr_supcon", "dinov2", "simMIM",
              "siaMIM", "SHAM", "DenseCL", "MSN"]


def build_eval_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Self-supervised/Supervised Trainer Arguments (hairci eval)")
    p.add_argument("--save_path", type=str,
                   default="classification_output_dir")
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--train_annotation", type=str)
    p.add_argument("--test_annotation", type=str)
    p.add_argument("--img_dir", type=str)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--mode", type=str, default="simclr_supcon",
                   choices=EVAL_MODES)
    p.add_argument("--model", type=str, default="resnet18",
                   choices=["resnet18", "resnet50", "vit_b_16"])
    p.add_argument("--checkpoint_path", type=str, default=None)
    p.add_argument("--device", type=str, default="tpu")
    p.add_argument("--SHAM_mode", type=str, default="embedding",
                   choices=["embedding", "reconstruction"])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--config", type=str)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--eval_type", default=None, type=str,
                   choices=["knn", "linear_prob", "visualization",
                            "inter_intra_distance"])
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    return p


def _eval_dtype(args):
    return jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32


def recipe_for_eval(args, **recipe_kw):
    mode = "siameseim" if args.mode == "siaMIM" else args.mode
    return build_recipe(mode, backbone=args.model, img_size=args.size,
                        dtype=_eval_dtype(args), **recipe_kw)


def load_state(recipe, args, sample):
    """Returns (recipe, state) — the recipe may be rebuilt to match the
    checkpoint's variant (siaMIM decoder-norm layout)."""
    state = recipe.create_state(jax.random.key(args.seed), sample)
    if args.checkpoint_path and args.checkpoint_path.endswith((".pth", ".pt")):
        # reference-trained torch checkpoint → converted weights
        # (per-mode formats mirror `knn_classification.py:124-189`)
        from hairci.retrieval import torch_import as ti

        sd = ti.load_torch_state_dict(args.checkpoint_path)
        if args.mode == "SHAM":
            params, stats = ti.convert_sham2(sd, args.model)
            state = state.replace(params=params, batch_stats=stats,
                                  ema_params=params, ema_batch_stats=stats)
        elif args.mode == "simclr":
            params, stats = ti.convert_simclr(sd, args.model)
            state = state.replace(params=params, batch_stats=stats)
        elif args.mode == "simclr_supcon":
            params, stats = ti.convert_supcon(sd, args.model)
            state = state.replace(params=params, batch_stats=stats)
        elif args.mode == "mae":
            params, _ = ti.convert_mae(sd)
            state = state.replace(params=params)
        elif args.mode == "simMIM":
            params, _ = ti.convert_simmim(sd)
            state = state.replace(params=params)
        elif args.mode == "MSN":
            params, stats, emap, emas = ti.convert_msn(sd)
            state = state.replace(params=params, batch_stats=stats,
                                  ema_params=emap, ema_batch_stats=emas)
        elif args.mode == "DenseCL":
            params, stats, emap, emas = ti.convert_densecl(sd)
            state = state.replace(params=params, batch_stats=stats,
                                  ema_params=emap, ema_batch_stats=emas)
        elif args.mode == "dinov2":
            params, emap = ti.convert_dinov2(sd)
            state = state.replace(params=params, ema_params=emap)
        elif args.mode == "siaMIM":
            # LN-variant checkpoints (`use_proj_ln`/`use_pred_ln`,
            # backbone.py:1280-1292) carry LayerNorm decoder-block norms;
            # the module must be built with the matching `block_norm` or
            # the converted params merge into a corrupt tree. Detect from
            # the torch keys and rebuild the recipe when they disagree.
            want = ti.siameseim_block_norm(sd)
            if want != recipe.block_norm:
                recipe = recipe_for_eval(args, block_norm=want)
                state = recipe.create_state(jax.random.key(args.seed),
                                            sample)
            # encoders + decoder stack when the ckpt has one (merge over
            # init for anything absent — see convert_siameseim docstring)
            params, stats, emap, emastats = ti.convert_siameseim(sd)
            state = state.replace(
                params=ti.merge_params(state.params, params),
                batch_stats=ti.merge_params(state.batch_stats, stats),
                ema_params=ti.merge_params(state.ema_params, emap),
                ema_batch_stats=ti.merge_params(
                    state.ema_batch_stats, emastats))
        else:
            raise SystemExit(
                f"torch import for mode {args.mode} not wired; convert with "
                "hairci.retrieval.torch_import manually")
        logging.info("torch checkpoint converted from %s",
                     args.checkpoint_path)
    elif args.checkpoint_path:
        # Accept a run dir or its checkpoints/ folder too, resolving to the
        # newest checkpoint (`get_latest_checkpoint` convenience the
        # reference applies on resume, utils/utils.py:120-137).
        path = args.checkpoint_path
        for cand in (path, os.path.join(path, "checkpoints")):
            latest = ckpt_lib.get_latest_checkpoint(cand)
            if latest:
                path = latest
                break
        state = ckpt_lib.restore_params_only(path, state)
        logging.info("checkpoint loaded from %s", path)
    else:
        logging.warning("no --checkpoint_path; evaluating random init")
    return recipe, state


def main(argv=None) -> None:
    from hairci.utils import apply_platform_env, enable_compilation_cache

    apply_platform_env()
    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO)
    parser = build_eval_parser()
    args = parser.parse_args(argv)
    args = merge_config_with_args(args, parser, argv)
    set_seed(args.seed)

    # deterministic eval loaders: exact CenterCrop(size) on host, normalize
    # on device inside the recipe's extract_features (knn_transform parity)
    train_m = load_manifest(args.train_annotation, args.img_dir)
    test_m = load_manifest(args.test_annotation, args.img_dir)
    train_loader = DataLoader(train_m, args.batch_size, size=args.size,
                              mode="center_crop", shuffle=False,
                              num_workers=args.num_workers)
    test_loader = DataLoader(test_m, args.batch_size, size=args.size,
                             mode="center_crop", shuffle=False,
                             num_workers=args.num_workers)

    recipe = recipe_for_eval(args)
    sample = jnp.zeros((min(args.batch_size, 8), args.size, args.size, 3),
                       jnp.uint8)
    recipe, state = load_state(recipe, args, sample)

    def embed_fn(images):
        return recipe.extract_features(state, images)

    clf = Classifier(embed_fn, train_loader, test_loader, args.save_path,
                     batch_size=args.batch_size)
    if args.eval_type == "knn":
        clf.knn_eval()
    elif args.eval_type == "linear_prob":
        clf.linear_probe_eval()
    elif args.eval_type == "visualization":
        clf.save_umap(split="test")
    elif args.eval_type == "inter_intra_distance":
        clf.compute_intra_inter_variance(split="both")
    else:
        raise SystemExit("--eval_type is required")


if __name__ == "__main__":
    main()
