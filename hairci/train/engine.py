"""Training engine — the TPU counterpart of the reference `Trainer`
(`/root/reference/HairPretraining/src/pretrain_engine.py:37-851`).

What maps where:
  - per-mode epoch loops (`:217-600`)    → one generic epoch loop over the
    recipe's jitted `train_step` (recipes own their losses/EMA/mining)
  - run-dir naming (`:183-199`)          → `run_name()`
  - txt logging (`:205-211,754-755`)     → `training_log.txt` + metrics.jsonl
  - ckpt every 50 + latest (`:787-816`)  → Orbax via train/checkpoint.py
  - resume (`:127-174`)                  → restores EMA + neg cache too
    (fixing the reference's resume gap at `:169-171`)
  - SHAM staged mining / adaptive k      → host-side staging calling the
    jitted step with a static ``stage`` (3 compiled variants total)

Performance: metrics stay on device all epoch (one host sync per epoch) —
per-step `.item()` syncs like the reference's `running_loss += loss.item()`
would serialize dispatch on TPU.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hairci.parallel import batch_sharding, create_mesh, replicated_sharding
from hairci.train import checkpoint as ckpt_lib
from hairci.train.state import TrainState

log = logging.getLogger(__name__)


def run_name(args) -> str:
    """Run-dir naming encoding the config (`pretrain_engine.py:183-199`)."""
    parts = [
        args.mode,
        getattr(args, "model", "resnet18"),
        f"ep{args.epochs}",
        f"bs{args.batch_size}",
        f"lr{args.lr}",
        f"temp{getattr(args, 'temp', 0.5)}",
    ]
    if getattr(args, "mode", "") == "SHAM":
        parts += [
            f"warm{args.warm_up_epochs}",
            f"ema{args.ema}",
            f"k{args.k}",
        ]
    if getattr(args, "ablation", "None") != "None":
        parts.append(f"abl_{args.ablation.replace(' ', '_')}")
    if getattr(args, "full_face_training", False):
        # the flag's only reference effect is the run-dir suffix
        # (`pretrain_engine.py:185-193`); multi_view/no_contrastive_loss/
        # training_settings are parsed but never consumed upstream — kept
        # on the CLI surface only
        parts.append("full_face_training")
    return "_".join(str(p) for p in parts)


class Trainer:
    def __init__(
        self,
        recipe,
        train_loader,
        args,
        mesh=None,
        checkpoint_every: int = 50,
    ):
        from hairci.utils import enable_compilation_cache

        enable_compilation_cache()  # 80-853s relay cold compiles -> once
        self.recipe = recipe
        self.train_loader = train_loader
        self.args = args
        if mesh is None:
            # data-axis size must divide the batch size
            import math

            n_devices = len(jax.devices())
            n_model = getattr(args, "n_model_shards", 1)
            n_data = math.gcd(args.batch_size, max(n_devices // n_model, 1))
            mesh = create_mesh(n_data=n_data, n_model=n_model,
                               devices=jax.devices()[: n_data * n_model])
        self.mesh = mesh
        self.checkpoint_every = checkpoint_every
        self.save_path = os.path.join(
            getattr(args, "save_path", "output_dir"), run_name(args))
        os.makedirs(self.save_path, exist_ok=True)
        self.log_file = os.path.join(self.save_path, "training_log.txt")
        self.metrics_file = os.path.join(self.save_path, "metrics.jsonl")
        self.start_epoch = 0
        self.prev_margin_violations = 0.0
        self._jitted = {}

    # ------------------------------------------------------------------
    def _step_fn(self, stage: Optional[str]):
        """One compiled step per static stage."""
        key = stage or "default"
        if key not in self._jitted:
            # NOTE: state donation (donate_argnums=0) was tried and
            # reverted — recipes alias leaves at init (ema_params IS params
            # until the first update), which XLA rejects as a double
            # donation, and the saving is ~0.3% of the step
            if stage is None:
                self._jitted[key] = jax.jit(self.recipe.train_step)
            else:
                self._jitted[key] = jax.jit(
                    self.recipe.train_step, static_argnames="stage")
        return self._jitted[key]

    def _place_state(self, state: TrainState) -> TrainState:
        return jax.device_put(state, replicated_sharding(self.mesh))

    def _place_batch(self, images: np.ndarray):
        return jax.device_put(images, batch_sharding(self.mesh, images.ndim))

    # ------------------------------------------------------------------
    def create_or_restore_state(self, sample_images) -> TrainState:
        state = self.recipe.create_state(
            jax.random.key(getattr(self.args, "seed", 42)), sample_images)
        if getattr(self.args, "continue_training", False):
            folder = getattr(self.args, "checkpoint_folder", None) or self.save_path
            path = ckpt_lib.get_latest_checkpoint(folder)
            if path:
                state, epoch = ckpt_lib.restore_checkpoint(path, state)
                self.start_epoch = epoch + 1
                log.info("resumed from %s at epoch %d", path, epoch)
        return self._place_state(state)

    # ------------------------------------------------------------------
    def train(self) -> TrainState:
        args = self.args
        is_sham = args.mode == "SHAM"
        base_key = jax.random.key(getattr(args, "seed", 42))
        total_k = getattr(args, "k", 7)

        if len(self.train_loader) == 0:
            raise ValueError(
                f"train loader is empty: {len(self.train_loader.manifest)} "
                f"samples with batch_size={args.batch_size} and "
                f"drop_last={getattr(self.train_loader, 'drop_last', '?')}")

        # init/restore from a zeros sample of the static batch shape
        raw = getattr(self.train_loader, "size", getattr(args, "size", 224))
        sample = jnp.zeros((args.batch_size, raw, raw, 3), jnp.uint8)
        state = self.create_or_restore_state(sample)

        for epoch in range(self.start_epoch, args.epochs):
            self.train_loader.set_epoch(epoch)
            epoch_metrics = []
            t0 = time.perf_counter()
            n_images = 0

            stage = None
            if is_sham:
                stage = self.recipe.stage_for_epoch(epoch)
                if stage == "mine":
                    total_k = self.recipe.adapt_k(
                        self.prev_margin_violations, args.batch_size)
                    log.info("epoch %d: mining hard negatives with k=%d",
                             epoch, total_k)

            for batch_id, (images, labels) in enumerate(self.train_loader):
                rng = jax.random.fold_in(
                    jax.random.fold_in(base_key, epoch), batch_id)
                batch = {"image": self._place_batch(images),
                         "label": self._place_batch(
                             np.asarray(labels, np.int32))}
                if is_sham:
                    state, metrics = self._step_fn(stage)(
                        state, batch, rng, stage=stage,
                        batch_id=batch_id, k=total_k)
                elif args.mode == "dinov2":
                    # per-step schedules (`pretrain_engine.py:450-509`)
                    gstep = epoch * len(self.train_loader) + batch_id
                    state, metrics = self._step_fn(None)(
                        state, batch, rng,
                        teacher_temp=self.recipe.teacher_temp(gstep),
                        momentum=self.recipe.momentum(gstep))
                elif hasattr(self.recipe, "momentum_for_epoch"):
                    # per-epoch cosine momentum (BYOL/DenseCL/SiameseIM)
                    state, metrics = self._step_fn(None)(
                        state, batch, rng,
                        momentum=self.recipe.momentum_for_epoch(epoch))
                else:
                    state, metrics = self._step_fn(None)(state, batch, rng)
                epoch_metrics.append(metrics)
                n_images += images.shape[0]

            if not epoch_metrics:
                continue
            # one host sync per epoch
            stacked = jax.tree_util.tree_map(
                lambda *xs: float(jnp.mean(jnp.stack(xs))), *epoch_metrics)
            if is_sham:
                # mean per-batch violations drives next epoch's k
                self.prev_margin_violations = stacked.get(
                    "margin_violations", 0.0)
            dt = time.perf_counter() - t0
            stacked["epoch"] = epoch
            stacked["images_per_sec"] = n_images / dt
            self._log_epoch(epoch, stacked, total_k)

            if (epoch + 1) % self.checkpoint_every == 0:
                ckpt_lib.save_checkpoint(
                    self.save_path, f"model_ckpt_{epoch + 1}", state, epoch)
            ckpt_lib.save_checkpoint(
                self.save_path, "model_ckpt_latest", state, epoch)
        return state

    # ------------------------------------------------------------------
    def _log_epoch(self, epoch: int, metrics: Dict[str, Any], total_k) -> None:
        with open(self.metrics_file, "a") as f:
            f.write(json.dumps(metrics) + "\n")
        if self.args.mode == "SHAM":
            line = (
                f"\nEpoch {epoch}: Total Loss = {metrics.get('loss', 0):.6f}, "
                f"Contrastive Loss = {metrics.get('contrastive_loss', 0):.6f}, "
                f"Triplet Loss = {metrics.get('triplet_loss', 0):.6f}, "
                f"MSE loss = {metrics.get('mse_loss', 0):.6f}, "
                f"Positive distance = {metrics.get('pos_dist', 0):.6f}, "
                f"Negative distance = {metrics.get('neg_dist', 0):.6f}, "
                f"Margin violations: {metrics.get('margin_violations', 0)}, "
                f"Total k: {total_k}\n"
            )
        else:
            line = f"\nEpoch {epoch}: Loss = {metrics.get('loss', 0):.6f}\n"
        with open(self.log_file, "a") as f:
            f.write(line)
        log.info("epoch %d: %s", epoch,
                 {k: round(v, 4) if isinstance(v, float) else v
                  for k, v in metrics.items()})
