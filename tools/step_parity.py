#!/usr/bin/env python
"""Step-level numerics parity: torch vs hairci SHAM/SimCLR training step.

Both sides start from the IDENTICAL weights (torch init exported through
`hairci.retrieval.torch_import.convert_sham2`) and consume the IDENTICAL
pre-augmented views, then take N Adam steps of the same NT-Xent loss
(one fused [neg; pos; anchor] 3B forward, batch-stats BN, grad-clip 1.0,
lr 1e-3) — the `--simclr_only` slice of the trained accuracy-parity
harness (tools/accuracy_parity.py). Per-step losses are printed side by
side; a divergence here localizes any torch-vs-hairci learning gap to
model/optimizer numerics rather than data or augmentation.

Reference semantics under comparison: the SHAM hot loop at
/root/reference/HairPretraining/src/pretrain_engine.py:602-757.

Run: python tools/step_parity.py [--steps 30] [--size 64] [--batches 4]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TEMP, LR = 0.5, 1e-3


def make_views(size: int, n_batches: int, batch: int):
    """Fixed hairci-augmented (anchor, pos1, neg_idx) per batch."""
    from hairci.utils import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from hairci.aug.pipelines import MultiViewTransform, ViewConfig
    from hairci.ssl.sham import derangement
    from tools.convergence_demo import make_dataset

    xs, _ = make_dataset(n_batches * batch, 8, size, seed=17)
    v = ViewConfig(size=size, cj_hue=0.0)
    tf = MultiViewTransform((v, v))
    out = []
    for bi in range(n_batches):
        key = jax.random.fold_in(jax.random.key(123), bi)
        ka, kn = jax.random.split(key)
        a, p = tf(ka, jnp.asarray(xs[bi * batch:(bi + 1) * batch]))
        neg = np.asarray(derangement(kn, batch))
        out.append((np.asarray(a), np.asarray(p), neg))
    return out


def build_torch_model(seed: int = 0):
    import torch

    sys.path.insert(0, os.path.join(ROOT, "tests"))
    from torch_fixtures import SHAMTorch

    torch.manual_seed(seed)
    return SHAMTorch()


def torch_sd_to_hairci(model):
    """SHAMTorch state dict → (params, batch_stats). The fixture uses plain
    torchvision names (not the Sequential-children layout convert_sham2
    strips), so convert the two subtrees directly."""
    from hairci.retrieval.torch_import import (
        convert_resnet,
        convert_simclr_projection_head,
    )

    sd = {}
    for k, v in model.state_dict().items():
        if k.startswith("head."):
            k = "projection_head.layers." + k[len("head."):]
        # .copy(): .numpy() aliases the torch buffer, and the torch side
        # trains in place — without it the "initial" hairci params silently
        # track torch's updates
        sd[k] = v.detach().numpy().copy()
    backbone_sd = {k[len("backbone."):]: v for k, v in sd.items()
                   if k.startswith("backbone.")}
    bp, bs = convert_resnet(backbone_sd, (2, 2, 2, 2), bottleneck=False)
    hp, hs = convert_simclr_projection_head(sd, "projection_head.")
    return ({"backbone": bp, "projection_head": hp},
            {"backbone": bs, "projection_head": hs})


def run_torch(model, views, steps, opt=None):
    import torch
    import torch.nn.functional as F

    def nt_xent(z0, z1):
        z0, z1 = F.normalize(z0, dim=1), F.normalize(z1, dim=1)
        z = torch.cat([z0, z1], 0)
        sim = z @ z.T / TEMP
        n = z.shape[0]
        sim.fill_diagonal_(float("-inf"))
        pos = (torch.arange(n) + n // 2) % n
        return F.cross_entropy(sim, pos)

    if opt is None:  # pass a persistent optimizer for multi-epoch use —
        # a fresh one here resets Adam moments between epochs
        opt = torch.optim.Adam(model.parameters(), lr=LR, betas=(0.9, 0.999))
    losses = []
    model.train()
    for s in range(steps):
        v = views[s % len(views)]
        (a, p, pos, neg_idx) = v if len(v) == 4 else (v[0], v[1], v[1], v[2])
        stacked = torch.tensor(
            np.concatenate([p[neg_idx], pos, a]).transpose(0, 3, 1, 2))
        out = model(stacked)
        _, pos_b, anchor_b = out.chunk(3)
        loss = nt_xent(pos_b, anchor_b)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def run_hairci(params, batch_stats, size, views, steps):
    """Fixed-views N-step run — thin wrapper over the stateful trainer
    (views repeat cyclically like run_torch's)."""
    cyclic = [views[s % len(views)] for s in range(steps)]
    _, _, losses = run_hairci_stateful(params, batch_stats, size, cyclic)
    return losses


def flax_init_into_torch(model, params, stats):
    """Load hairci's native init (incl. the zero-init residual-BN gammas,
    resnet.py scale_init=zeros) into the torch mirror."""
    import torch

    from hairci.retrieval.torch_import import export_resnet

    sd = {f"backbone.{k}": v for k, v in export_resnet(
        params["backbone"], stats["backbone"]).items()}
    hp, hs = params["projection_head"], stats["projection_head"]
    for i, (lin, bn) in enumerate((("0", "1"), ("3", "4"))):
        sd[f"head.{lin}.weight"] = np.asarray(
            hp[f"dense{i}"]["kernel"]).T
        sd[f"head.{bn}.weight"] = np.asarray(hp[f"bn{i}"]["scale"])
        sd[f"head.{bn}.bias"] = np.asarray(hp[f"bn{i}"]["bias"])
        sd[f"head.{bn}.running_mean"] = np.asarray(hs[f"bn{i}"]["mean"])
        sd[f"head.{bn}.running_var"] = np.asarray(hs[f"bn{i}"]["var"])
    missing, unexpected = model.load_state_dict(
        {k: torch.tensor(np.asarray(v).copy()) for k, v in sd.items()},
        strict=False)
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in m for m in missing), missing


def run_epochs(size: int, epochs: int, n_train: int, batch: int,
               pos_transform: str = "none", init: str = "torch"):
    """Full-epoch variant: BOTH sides train on the SAME fresh hairci views
    every step, then both are kNN-evaluated with the SAME protocol
    (normalize-only, no crop) — the last two uncontrolled variables of the
    trained accuracy-parity harness."""
    from hairci.utils import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from hairci.aug.pipelines import MultiViewTransform, ViewConfig
    from hairci.ssl.sham import derangement
    from tools.convergence_demo import knn_accuracy, make_dataset

    n_test = 512
    xs, ys = make_dataset(n_train + n_test, 8, size, seed=17)
    xs_tr, ys_tr = xs[:n_train], ys[:n_train]
    xs_te, ys_te = xs[n_train:], ys[n_train:]
    nb = n_train // batch
    v = ViewConfig(size=size, cj_hue=0.0)
    tf = jax.jit(MultiViewTransform((v, v)))

    model = build_torch_model()
    if init == "flax":
        from hairci.ssl.sham import SHAMModule

        module = SHAMModule(backbone_name="resnet18", img_size=size,
                            dtype=jnp.float32)
        variables = module.init(jax.random.key(0),
                                jnp.zeros((2, size, size, 3)), train=True)
        params, batch_stats = variables["params"], variables["batch_stats"]
        flax_init_into_torch(model, params, batch_stats)
    else:
        params, batch_stats = torch_sd_to_hairci(model)

    import torch

    opt = torch.optim.Adam(model.parameters(), lr=LR, betas=(0.9, 0.999))
    pt_torch = None
    if pos_transform == "torch":
        from tools.accuracy_parity import TorchAug

        pt_torch = TorchAug(np.random.default_rng(7), size)
    if pos_transform == "hairci":
        from hairci.aug.pipelines import positive_transform as hc_pt

    lt = lh = None
    for e in range(epochs):
        views = []
        for bi in range(nb):
            key = jax.random.fold_in(jax.random.key(123), e * 1000 + bi)
            ka, kn, kp = jax.random.split(key, 3)
            a, p = tf(ka, jnp.asarray(xs_tr[bi * batch:(bi + 1) * batch]))
            # SHAM's NT-Xent positive is positive_transform(pos1)
            # (pretrain_engine.py:684-695); `none` drops it, `hairci`/`torch`
            # apply each side's implementation to BOTH trainers
            if pos_transform == "hairci":
                pos = np.asarray(hc_pt(kp, p))
            elif pos_transform == "torch":
                pos = pt_torch.positive_transform(np.asarray(p))
            else:
                pos = np.asarray(p)
            views.append((np.asarray(a), np.asarray(p), pos,
                          np.asarray(derangement(kn, batch))))
        lt = run_torch(model, views, nb, opt=opt)
        lh_state = run_hairci_stateful(params, batch_stats, size, views) \
            if e == 0 else run_hairci_stateful(None, None, size, views)
        params, batch_stats, lh = lh_state
        print(f"epoch {e + 1}/{epochs}: torch loss {np.mean(lt):.4f}  "
              f"hairci loss {np.mean(lh):.4f}", file=sys.stderr)

    # identical eval protocol for both: normalize-only features, cosine kNN
    from tools.accuracy_parity import IMAGENET_MEAN, IMAGENET_STD

    def norm(x):
        return (x.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD

    model.eval()
    with torch.no_grad():
        def tfeat(x):
            outs = []
            for i in range(0, len(x), 128):
                outs.append(model.backbone(torch.tensor(
                    norm(x[i:i + 128]).transpose(0, 3, 1, 2))).numpy())
            return np.concatenate(outs)

        t_tr, t_te = tfeat(xs_tr), tfeat(xs_te)

    from hairci.ssl.sham import SHAMModule

    module = SHAMModule(backbone_name="resnet18", img_size=size,
                        dtype=jnp.float32)

    @jax.jit
    def hfeat_batch(x):
        return module.apply({"params": params, "batch_stats": batch_stats},
                            x, train=False,
                            method=module.extract_features)

    def hfeat(x):
        return np.concatenate([np.asarray(hfeat_batch(jnp.asarray(
            norm(x[i:i + 128])))) for i in range(0, len(x), 128)])

    h_tr, h_te = hfeat(xs_tr), hfeat(xs_te)
    acc_t = knn_accuracy(jnp.asarray(t_tr), jnp.asarray(ys_tr),
                         jnp.asarray(t_te), jnp.asarray(ys_te), k=5,
                         classes=8)
    acc_h = knn_accuracy(jnp.asarray(h_tr), jnp.asarray(ys_tr),
                         jnp.asarray(h_te), jnp.asarray(ys_te), k=5,
                         classes=8)
    print(f"kNN@5 top-1 (same views, same eval): torch {acc_t:.4f}  "
          f"hairci {acc_h:.4f}")


_HAIRCI_STATE = {}


def run_hairci_stateful(params, batch_stats, size, views):
    """Like run_hairci but keeps (params, stats, opt_state) across calls."""
    import jax
    import jax.numpy as jnp
    import optax

    from hairci.losses import nt_xent_loss
    from hairci.ssl.sham import SHAMModule
    from hairci.train.optim import make_optimizer

    st = _HAIRCI_STATE
    if params is not None:
        st["module"] = SHAMModule(backbone_name="resnet18", img_size=size,
                                  dtype=jnp.float32)
        st["tx"] = make_optimizer(LR, 0.0, (0.9, 0.999), grad_clip=1.0)
        st["params"], st["bs"] = params, batch_stats
        st["opt"] = st["tx"].init(params)
        module, tx = st["module"], st["tx"]

        @jax.jit
        def step(params, batch_stats, opt_state, stacked):
            def loss_fn(p):
                out, upd = module.apply(
                    {"params": p, "batch_stats": batch_stats}, stacked,
                    train=True, mutable=["batch_stats"])
                _, pos_b, anchor_b = jnp.split(out, 3, axis=0)
                return (nt_xent_loss(pos_b, anchor_b, TEMP),
                        upd["batch_stats"])

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return (loss, optax.apply_updates(params, updates), new_bs,
                    opt_state2)

        st["step"] = step

    losses = []
    for v in views:
        (a, p, pos, neg_idx) = v if len(v) == 4 else (v[0], v[1], v[1], v[2])
        stacked = jnp.asarray(np.concatenate([p[neg_idx], pos, a]))
        loss, st["params"], st["bs"], st["opt"] = st["step"](
            st["params"], st["bs"], st["opt"], stacked)
        losses.append(float(loss))
    return st["params"], st["bs"], losses


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=0,
                    help="full-epoch mode: fresh views per step + identical "
                         "kNN eval on both sides")
    ap.add_argument("--pos_transform", default="none",
                    choices=["none", "hairci", "torch"],
                    help="epoch mode: which positive_transform "
                         "implementation BOTH trainers consume")
    ap.add_argument("--init", default="torch", choices=["torch", "flax"],
                    help="epoch mode: shared init — torch fixture "
                         "(kaiming fan_out, BN gamma=1, the reference's) or "
                         "hairci native (lecun_normal, zero residual-BN "
                         "gamma)")
    args = ap.parse_args(argv)

    if args.epochs:
        return run_epochs(args.size, args.epochs, args.batches * args.batch,
                          args.batch, pos_transform=args.pos_transform,
                          init=args.init)

    views = make_views(args.size, args.batches, args.batch)
    model = build_torch_model()
    params, batch_stats = torch_sd_to_hairci(model)

    lt = run_torch(model, views, args.steps)
    lh = run_hairci(params, batch_stats, args.size, views, args.steps)

    print(f"{'step':>4} {'torch':>9} {'hairci':>9} {'delta':>9}")
    worst = 0.0
    for s, (a, b) in enumerate(zip(lt, lh)):
        d = b - a
        worst = max(worst, abs(d))
        print(f"{s:>4} {a:9.4f} {b:9.4f} {d:+9.4f}")
    print(f"max |delta| = {worst:.4f} over {args.steps} steps")


if __name__ == "__main__":
    main()
