"""`mainpretrain.py` — the pretraining entry point, CLI-surface compatible
with `/root/reference/HairPretraining/mainpretrain.py` (same flags/YAML, see
hairci/utils/config.py), dispatching to TPU-native recipes.

Usage:
    python -m hairci.cli.mainpretrain --mode SHAM --model resnet18 \
        --train_annotation data_train.csv --img_dir images/ --epochs 50
"""

from __future__ import annotations

import logging
import sys

import jax.numpy as jnp

from hairci.data import DataLoader, load_manifest
from hairci.ssl import build_recipe
from hairci.train.engine import Trainer
from hairci.utils import apply_platform_env, parse_pretrain_args, set_seed


def build_recipe_from_args(args, num_batches: int):
    """Mode dispatch mirroring `mainpretrain.py:100-173`."""
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    common = dict(
        img_size=args.size,
        learning_rate=args.lr,
        weight_decay=args.weight_decay,
        betas=(args.beta1, args.beta2),
        dtype=dtype,
    )
    mode = args.mode
    if mode in ("simclr", "S2R2"):
        # `--mode S2R2` is a dead branch upstream (`mainpretrain.py:61` lists
        # it in choices but `:147-171` has no model for it → NameError).
        # hairci realizes the advertised intent: SimCLR + Smooth-AP
        # regularization (the same s2r2_loss SHAM wires via `--S2R2`).
        s2r2 = 1.0 if (mode == "S2R2" or getattr(args, "S2R2", False)) else 0.0
        return build_recipe("simclr", backbone=args.model,
                            temperature=args.temp, s2r2_weight=s2r2,
                            **common)
    if mode == "SHAM":
        return build_recipe(
            "SHAM", backbone=args.model, temperature=args.temp,
            ema_momentum=args.ema, warm_up_epochs=args.warm_up_epochs,
            ablation=args.ablation, num_batches=num_batches,
            s2r2_weight=1.0 if getattr(args, "S2R2", False) else 0.0,
            **common)
    if mode in ("mae", "simMIM", "dinov2", "MSN", "DenseCL", "BYOL",
                "simclr_supcon", "siameseim"):
        # thread the real run length into the schedule-carrying recipes:
        # dinov2's per-step teacher-temp/momentum warmup+cosine and the
        # BYOL/DenseCL per-epoch cosine momentum span exactly the run
        # (`pretrain_engine.py:450-509` computes them from epochs * steps)
        return build_recipe(mode, epochs=args.epochs,
                            steps_per_epoch=num_batches, **common)
    raise SystemExit(f"mode {mode!r} is not implemented yet")


def main(argv=None) -> None:
    apply_platform_env()  # HAIRCI_PLATFORM/HAIRCI_FORCE_CPU, pre-backend
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    args = parse_pretrain_args(argv)
    if getattr(args, "num_processes", None) and args.num_processes > 1:
        from hairci.parallel.collectives import init_distributed

        init_distributed(args.coordinator, args.num_processes,
                         args.process_index)
    set_seed(args.seed)

    if not args.train_annotation or not args.img_dir:
        raise SystemExit("--train_annotation and --img_dir are required")

    manifest = load_manifest(args.train_annotation, args.img_dir)
    drop_last = args.mode == "SHAM"  # `mainpretrain.py:141-143`
    raw_size = max(args.size, int(args.size * 256 / 224))  # headroom for RRC
    loader = DataLoader(
        manifest, batch_size=args.batch_size, size=raw_size,
        mode="raw_resize", shuffle=True, drop_last=drop_last,
        pad_last=not drop_last,  # static shapes under jit/sharding
        seed=args.seed, num_workers=args.num_workers)
    recipe = build_recipe_from_args(args, num_batches=len(loader))
    trainer = Trainer(recipe, loader, args)
    trainer.train()


if __name__ == "__main__":
    main()
