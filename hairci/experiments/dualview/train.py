"""DualViewHair training loops — parity with the reference scripts
(`/root/reference/experiments/DualViewHair/scripts/`):
  simple_train.py     → `train(loss="infonce")`
  train_ntxent.py     → `train(loss="ntxent" | "asymmetric")`
  train_with_queue.py → `train(loss="queue")` (4096-negative MomentumQueue)
  train_enhanced.py   → `train(encoder="multiscale"|"partbased",
                                loss="hybrid")`
  compare_losses.py   → `compare_losses()` (runs each loss briefly)
"""

from __future__ import annotations

import argparse
import logging
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from hairci.aug import ops
from hairci.experiments.dualview.data import PairLoader
from hairci.experiments.dualview.losses import (
    MomentumQueue,
    asymmetric_ntxent_loss,
    ntxent_loss_symmetric,
)
from hairci.experiments.dualview.models import DualViewHairModel, contrastive_loss

log = logging.getLogger(__name__)


def _student_aug(key, x):
    """RandomCrop + flip + jitter (student view, `simple_dataloader.py:63`)."""
    x = ops.to_float(x)
    ks = jax.random.split(key, 3)
    size = x.shape[1]
    x = ops.random_resized_crop(ks[0], x, size, scale=(0.6, 1.0))
    x = ops.random_hflip(ks[1], x)
    x = ops.color_jitter(ks[2], x, 0.4, 0.4, 0.4, 0.1, p=0.8)
    return ops.normalize(x)


def _teacher_aug(x):
    """Resize-only teacher view."""
    return ops.normalize(ops.to_float(x))


def make_train_step(model: DualViewHairModel, loss: str = "infonce",
                    queue: MomentumQueue | None = None):
    def step(state, batch, rng, bank=None, ptr=None):
        full = _student_aug(rng, batch["full"])
        hair = _teacher_aug(batch["hair"])

        from hairci.train.state import ema_update

        ema_params = ema_update(state.ema_params, state.params, model.momentum)
        ema_bs = ema_update(state.ema_batch_stats, state.batch_stats,
                            model.momentum)
        state = state.replace(ema_params=ema_params, ema_batch_stats=ema_bs)
        teacher = jax.lax.stop_gradient(model.encoder.apply(
            {"params": state.ema_params,
             "batch_stats": state.ema_batch_stats}, hair, train=False))

        def loss_fn(params):
            student, updates = model.encoder.apply(
                {"params": params, "batch_stats": state.batch_stats},
                full, train=True, mutable=["batch_stats"])
            if loss == "infonce":
                l = contrastive_loss(student, teacher, model.temperature)
            elif loss == "ntxent":
                l = ntxent_loss_symmetric(student, teacher, model.temperature)
            elif loss == "asymmetric":
                l = asymmetric_ntxent_loss(student, teacher,
                                           model.temperature)
            elif loss == "queue":
                l = queue.loss(student, teacher, bank, model.temperature)
            elif loss == "hybrid":
                from hairci.experiments.dualview.enhanced import hybrid_loss

                l, _ = hybrid_loss(student, teacher, model.temperature)
            else:
                raise ValueError(loss)
            return l, updates.get("batch_stats", state.batch_stats)

        (l, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads, batch_stats=new_bs)
        out = {"loss": l}
        if loss == "queue":
            bank, ptr = queue.enqueue(bank, ptr, teacher)
            return state, out, bank, ptr
        return state, out

    return step


def train(data_root: str, epochs: int = 10, batch_size: int = 32,
          size: int = 224, loss: str = "infonce", seed: int = 42,
          learning_rate: float = 1e-3, dtype=jnp.float32,
          encoder: str = "resnet", save_path: str | None = None) -> Dict:
    model = DualViewHairModel(learning_rate=learning_rate, dtype=dtype,
                              encoder=encoder)
    loader = PairLoader(data_root, batch_size, size)
    queue = MomentumQueue(model.encoder.projection_dim) if loss == "queue" \
        else None
    step = jax.jit(make_train_step(model, loss, queue))
    batch0 = next(iter(loader))
    state = model.create_state(jax.random.key(seed),
                               _teacher_aug(jnp.asarray(batch0["full"])))
    bank, ptr = queue.init() if queue else (None, None)
    history = []
    for epoch in range(epochs):
        losses = []
        for i, batch in enumerate(loader):
            rng = jax.random.fold_in(jax.random.key(seed), epoch * 10000 + i)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if queue:
                state, m, bank, ptr = step(state, batch, rng, bank, ptr)
            else:
                state, m = step(state, batch, rng)
            losses.append(m["loss"])
        avg = float(jnp.mean(jnp.stack(losses)))
        history.append(avg)
        log.info("epoch %d: loss %.4f", epoch, avg)
    if save_path:
        from hairci.train.checkpoint import save_checkpoint

        save_checkpoint(save_path, "dualview_latest", state, epoch=epochs)
        log.info("saved checkpoint to %s/dualview_latest", save_path)
    return {"model": model, "state": state, "history": history}


def compare_losses(data_root: str, epochs: int = 2, **kw) -> Dict[str, list]:
    """`compare_losses.py` parity: short runs of each loss variant."""
    return {name: train(data_root, epochs=epochs, loss=name, **kw)["history"]
            for name in ("infonce", "ntxent", "asymmetric", "queue")}


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--loss", default="infonce",
                   choices=["infonce", "ntxent", "asymmetric", "queue",
                            "hybrid"])
    p.add_argument("--encoder", default="resnet",
                   choices=["resnet", "multiscale", "partbased"])
    p.add_argument("--save_path", default=None)
    args = p.parse_args(argv)
    train(args.data_root, args.epochs, args.batch_size, args.size, args.loss,
          encoder=args.encoder, save_path=args.save_path)


if __name__ == "__main__":
    main()
