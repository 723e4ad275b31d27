#!/usr/bin/env python
"""Trained accuracy parity: hairci SHAM vs a bare-torch SHAM2-equivalent.

VERDICT r1 #4: the reference pipeline itself cannot run here (torchvision/
lightly/timm/faiss absent), so this trains a bare-torch replica of the
SHAM2 method — the model of `main_backbone.py:565-637`, the step of
`train_one_epoch_SHAM` (`/root/reference/HairPretraining/src/
pretrain_engine.py:602-757`), the samplers of `neg_sampling.py:10-53` —
and hairci's SHAM recipe on the SAME synthetic dataset and staging
schedule, then runs both through the same cosine-kNN top-1 eval
(`classification_engine.py:71-98` semantics). Target: top-1 within the
0.5% band of BASELINE.json.

Both sides use the same augmentation distributions (SimCLR two-view with
hue jitter disabled — the one op whose HSV round-trip differs subtly
between implementations; disabled on BOTH sides so the comparison stays
controlled), the same derangement→k-NN-mined negative staging, the same
losses (NT-Xent + 0.5*Triplet(0.7→0.5) + 0.2*MSE vs the EMA branch), the
same Adam(1e-3)+clip(1.0) optimizer. RNG streams differ by framework, so
the claim tested is statistical, not bitwise.

Run:  python -m tools.accuracy_parity [--side both|torch|hairci]
      [--epochs 12 --warmup 4 --out /tmp/accuracy_parity.json]
CPU:  HAIRCI_PLATFORM=cpu routes the hairci side off the relay.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.convergence_demo import knn_accuracy, make_dataset  # noqa: E402

# shared config
C, SIZE, B = 8, 32, 64
N_TRAIN, N_TEST = 512, 512
BACKBONE = "resnet18"  # --backbone resnet50 = the headline-scale config
TEMP, TRIPLET_W, MSE_W = 0.5, 0.5, 0.2
MARGIN1, MARGIN2 = 0.7, 0.5
EMA_M, LR = 0.99, 1e-3
VIEW_BLUR_K = None  # None → lightly 0.1*size rule on both sides
CROSS_AUG = False   # torch side consumes hairci's augmented views
ZERO_INIT_RES = False  # torch backbone zero-inits residual BN gammas
# (hairci's init; the reference keeps torchvision's False default)
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# torch side
# ---------------------------------------------------------------------------

def _torch_modules():
    """The torch SHAM2-equivalent mirror shared with the converter tests
    (tests/torch_fixtures.py — a plain module, importable outside
    pytest)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "torch_fixtures", os.path.join(ROOT, "tests", "torch_fixtures.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.SHAMTorch


class TorchAug:
    """Numpy/torch mirror of hairci's SimCLR ViewConfig (cj_hue=0) +
    positive_transform, matching the sampling distributions of
    `hairci/aug/ops.py` (torchvision semantics on both sides)."""

    def __init__(self, rng: np.random.Generator, size: int,
                 view_blur_k: int | None = None):
        self.rng = rng
        self.size = size
        self.view_blur_k = view_blur_k

    # --- torchvision RandomResizedCrop.get_params ---
    def _crop_params(self, H, W, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
        area = H * W
        for _ in range(10):
            target = area * self.rng.uniform(*scale)
            aspect = math.exp(self.rng.uniform(math.log(ratio[0]),
                                               math.log(ratio[1])))
            w = math.sqrt(target * aspect)
            h = math.sqrt(target / aspect)
            if 0 < w <= W and 0 < h <= H:
                top = self.rng.uniform() * (H - h)
                left = self.rng.uniform() * (W - w)
                return top, left, h, w
        return (H - H) / 2, (W - W) / 2, float(H), float(W)

    def rrc(self, x):  # x (B,H,W,3) float
        import torch
        import torch.nn.functional as F

        B_, H, W, _ = x.shape
        out = np.empty((B_, self.size, self.size, 3), np.float32)
        for i in range(B_):
            top, left, h, w = self._crop_params(H, W)
            # same resample as jax.image scale_and_translate bilinear
            img = torch.tensor(x[i]).permute(2, 0, 1)[None]
            # integer-box crop + antialiased resize (vs hairci's fractional
            # scale_and_translate: sub-pixel phase differs, distribution of
            # content does not)
            y0, y1 = int(math.floor(top)), int(math.ceil(top + h))
            x0, x1 = int(math.floor(left)), int(math.ceil(left + w))
            y1, x1 = min(max(y1, y0 + 1), H), min(max(x1, x0 + 1), W)
            crop = img[:, :, y0:y1, x0:x1]
            out[i] = F.interpolate(
                crop, size=(self.size, self.size), mode="bilinear",
                align_corners=False, antialias=True
            )[0].permute(1, 2, 0).numpy()
        return out

    def hflip(self, x, p=0.5):
        sel = self.rng.uniform(size=x.shape[0]) < p
        x = x.copy()
        x[sel] = x[sel, :, ::-1]
        return x

    @staticmethod
    def _gray(x):
        w = np.asarray([0.299, 0.587, 0.114], np.float32)
        return (x @ w)[..., None]

    def color_jitter(self, x, b=0.8, c=0.8, s=0.8, p=0.8):
        B_ = x.shape[0]
        fb = self.rng.uniform(max(0, 1 - b), 1 + b, (B_, 1, 1, 1))
        fc = self.rng.uniform(max(0, 1 - c), 1 + c, (B_, 1, 1, 1))
        fs = self.rng.uniform(max(0, 1 - s), 1 + s, (B_, 1, 1, 1))
        ops = [
            lambda im: im * fb,
            lambda im: self._gray(im).mean(axis=(1, 2, 3), keepdims=True)
            + (im - self._gray(im).mean(axis=(1, 2, 3), keepdims=True)) * fc,
            lambda im: np.repeat(self._gray(im), 3, -1)
            + (im - np.repeat(self._gray(im), 3, -1)) * fs,
        ]
        y = x.astype(np.float32)
        for j in self.rng.permutation(3):
            y = ops[j](y).astype(np.float32)
        y = np.clip(y, 0.0, 1.0)
        apply = (self.rng.uniform(size=(B_, 1, 1, 1)) < p)
        return np.where(apply, y, x).astype(np.float32)

    def grayscale(self, x, p=0.2):
        sel = self.rng.uniform(size=(x.shape[0], 1, 1, 1)) < p
        return np.where(sel, np.repeat(self._gray(x), 3, -1), x
                        ).astype(np.float32)

    def blur(self, x, ksize=3, sigma=(0.1, 2.0), p=0.5):
        import torch
        import torch.nn.functional as F

        B_, H, W, Ch = x.shape
        sig = self.rng.uniform(*sigma, B_)
        apply = self.rng.uniform(size=B_) < p
        half = ksize // 2
        grid = np.arange(-half, half + 1, dtype=np.float32)
        out = x.copy()
        t = torch.tensor(x.transpose(0, 3, 1, 2))
        for i in range(B_):
            if not apply[i]:
                continue
            k = np.exp(-(grid ** 2) / (2 * sig[i] ** 2))
            k /= k.sum()
            kh = torch.tensor(k, dtype=torch.float32).view(1, 1, 1, ksize)
            kv = kh.view(1, 1, ksize, 1)
            # reflect padding like hairci's gaussian_blur (aug/ops.py:336)
            img = F.pad(t[i:i + 1], (half, half, half, half), mode="reflect")
            img = F.conv2d(img, kh.expand(Ch, 1, 1, ksize), groups=Ch)
            img = F.conv2d(img, kv.expand(Ch, 1, ksize, 1), groups=Ch)
            out[i] = img[0].permute(1, 2, 0).numpy()
        return out

    @staticmethod
    def normalize(x):
        return (x - IMAGENET_MEAN) / IMAGENET_STD

    def view(self, x):
        y = self.rrc(x)
        y = self.hflip(y)
        y = self.color_jitter(y)
        y = self.grayscale(y)
        if self.view_blur_k:
            k = self.view_blur_k
        else:
            k = int(0.1 * self.size)  # lightly kernel ≈ 0.1*size, odd
            k = k + 1 if k % 2 == 0 else max(k, 3)  # = _blur_kernel_size
        y = self.blur(y, ksize=max(k, 3))
        return self.normalize(y)

    def positive_masking(self, x, patch=32, ratio_range=(0.1, 0.5),
                         thr=0.01):
        """Mirror of `mask_hair_patches` (`hairci/aug/hair_masking.py`):
        zero floor(U(lo,hi) * n_hair) random patches whose mean > thr."""
        B_, H_, W_, _ = x.shape
        ph, pw = H_ // patch, W_ // patch
        if ph * pw == 0:
            return x
        out = x.copy()
        for i in range(B_):
            m = x[i][:ph * patch, :pw * patch].reshape(
                ph, patch, pw, patch, 3).mean((1, 3, 4))
            hair = (m > thr).ravel()
            num = int(np.floor(self.rng.uniform(*ratio_range) * hair.sum()))
            if num < 1:
                continue
            sel = self.rng.choice(np.flatnonzero(hair), num, replace=False)
            for s in sel:
                py, px = divmod(int(s), pw)
                out[i, py * patch:(py + 1) * patch,
                    px * patch:(px + 1) * patch] = 0
        return out

    def positive_transform(self, x):
        """rotate ±15° nearest + blur(3, sigma in [0.1, 0.5]) on the
        normalized batch (`transform.py:21-24`)."""
        import torch
        import torch.nn.functional as F

        B_ = x.shape[0]
        theta = self.rng.uniform(-15, 15, B_) * math.pi / 180
        t = torch.tensor(x.transpose(0, 3, 1, 2))
        mats = torch.zeros((B_, 2, 3))
        mats[:, 0, 0] = torch.tensor(np.cos(theta), dtype=torch.float32)
        mats[:, 0, 1] = torch.tensor(-np.sin(theta), dtype=torch.float32)
        mats[:, 1, 0] = torch.tensor(np.sin(theta), dtype=torch.float32)
        mats[:, 1, 1] = torch.tensor(np.cos(theta), dtype=torch.float32)
        grid = F.affine_grid(mats, t.shape, align_corners=False)
        rot = F.grid_sample(t, grid, mode="nearest", padding_mode="zeros",
                            align_corners=False)
        y = rot.permute(0, 2, 3, 1).numpy()
        return self.blur(y, 3, (0.1, 0.5), p=1.0)


def train_torch(xs_train, epochs, warmup, seed=0, diag_data=None,
                diag_every=0):
    import torch
    import torch.nn.functional as F

    torch.manual_seed(seed)
    _SHAMTorch = _torch_modules()

    def SHAMTorch():
        return _SHAMTorch(zero_init_residual=ZERO_INIT_RES,
                          backbone=BACKBONE)

    def nt_xent(z0, z1, temp):
        z0 = F.normalize(z0, dim=1)
        z1 = F.normalize(z1, dim=1)
        z = torch.cat([z0, z1], 0)
        sim = z @ z.T / temp
        n = z.shape[0]
        sim.fill_diagonal_(float("-inf"))
        pos = (torch.arange(n, device=z.device) + n // 2) % n
        return F.cross_entropy(sim, pos)

    model = SHAMTorch()
    ema = SHAMTorch()
    ema.load_state_dict(model.state_dict())
    for p in ema.parameters():
        p.requires_grad_(False)
    opt = torch.optim.Adam(model.parameters(), lr=LR, betas=(0.9, 0.999))
    aug = TorchAug(np.random.default_rng(seed + 1), SIZE,
                   view_blur_k=VIEW_BLUR_K)

    hairci_views = None
    if CROSS_AUG:
        # diagnostic: feed the torch model hairci's actual augmented views
        # — isolates "torch aug mirror differs" from "torch training
        # numerics differ"
        from hairci.utils import apply_platform_env

        apply_platform_env()
        import jax

        from hairci.aug.pipelines import MultiViewTransform, ViewConfig
        from hairci.aug.pipelines import positive_transform as hc_pt

        v = ViewConfig(size=SIZE, cj_hue=0.0, blur_kernel=VIEW_BLUR_K)
        tf = MultiViewTransform((v, v))

        def hairci_views(images_uint8, e, bi):  # noqa: F811
            import jax.numpy as jnp

            key = jax.random.fold_in(jax.random.key(seed + 31), e * 1000 + bi)
            ka, kp = jax.random.split(key)
            anchor, pos1 = tf(ka, jnp.asarray(images_uint8))
            pos = hc_pt(kp, pos1)
            return (np.asarray(anchor), np.asarray(pos1), np.asarray(pos))

    nb = len(xs_train) // B
    xf = xs_train.astype(np.float32) / 255.0
    neg_cache = np.zeros((nb, B), np.int64)
    k_mined = 7

    def ema_update():
        with torch.no_grad():
            for (src, dst) in ((model.state_dict(), ema.state_dict()),):
                for key in src:
                    if dst[key].dtype.is_floating_point:
                        dst[key].mul_(EMA_M).add_(src[key], alpha=1 - EMA_M)
                    else:
                        dst[key].copy_(src[key])

    t0 = time.perf_counter()
    for e in range(epochs):
        if e + 1 < warmup:
            stage = "warmup"
        elif e + 1 == warmup:
            stage = "mine"
        else:
            stage = "mined"
        margin = MARGIN1 if stage == "warmup" else MARGIN2
        viol_total = 0.0
        for bi in range(nb):
            if hairci_views is not None:
                x_anchor, x_pos1, pos_ca = hairci_views(
                    xs_train[bi * B:(bi + 1) * B], e, bi)
            else:
                imgs = xf[bi * B:(bi + 1) * B]
                x_anchor = aug.view(imgs)
                x_pos1 = aug.view(imgs)

            ema_update()  # per-batch, BEFORE forward (pretrain_engine:621)

            if stage == "warmup":
                perm = np.random.default_rng(
                    (seed, e, bi)).permutation(B)
                idx = np.arange(B)
                neg_idx = np.where(perm == idx, (perm + 1) % B, perm)
            elif stage == "mine":
                ema.eval()
                with torch.no_grad():
                    f = ema.backbone(torch.tensor(
                        x_pos1.transpose(0, 3, 1, 2)))
                    f = F.normalize(f, dim=1).numpy()
                order = np.argsort(-(f @ f.T), axis=1, kind="stable")
                neg_idx = order[:, min(k_mined - 1, B - 1)]
                neg_cache[bi] = neg_idx
            else:
                neg_idx = neg_cache[bi]

            neg = x_pos1[neg_idx]
            pos = pos_ca if hairci_views is not None \
                else aug.positive_transform(x_pos1)
            # at 32px patch_size==img -> floor(ratio*1)=0, a no-op on both
            # sides; at >=64px this mirrors mask_hair_patches
            masked_pos = aug.positive_masking(pos)

            model.train()
            stacked = torch.tensor(
                np.concatenate([neg, pos, x_anchor]).transpose(0, 3, 1, 2))
            out = model(stacked)  # ONE 3B forward: BN stats over 3B rows,
            # mirroring hairci's fused online branch
            neg_b, pos_b, anchor_b = out.chunk(3)
            ema.eval()
            with torch.no_grad():
                masked_b = ema(torch.tensor(
                    masked_pos.transpose(0, 3, 1, 2)))
            neg_b = F.normalize(neg_b, dim=1)
            pos_b = F.normalize(pos_b, dim=1)
            anchor_b = F.normalize(anchor_b, dim=1)
            masked_b = F.normalize(masked_b, dim=1)

            loss = (nt_xent(pos_b, anchor_b, TEMP)
                    + TRIPLET_W * F.triplet_margin_loss(
                        anchor_b, pos_b, neg_b, margin=margin, eps=1e-6)
                    + MSE_W * F.mse_loss(pos_b, masked_b.detach()))
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            opt.step()

            with torch.no_grad():
                d_ap = (anchor_b - pos_b).norm(dim=1)
                d_an = (anchor_b - neg_b).norm(dim=1)
                viol_total += float((d_ap - d_an + margin > 0).sum())
        if stage == "warmup" and e + 2 == warmup:
            v = viol_total / nb / B
            k_mined = max(2, round((1 - v) * 10))
        print(f"[torch] epoch {e + 1}/{epochs} stage={stage} "
              f"loss={float(loss.detach()):.3f} k={k_mined} "
              f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr)
        if diag_every and diag_data is not None and (e + 1) % diag_every == 0:
            _torch_diag(model, diag_data, e + 1)

    def features(x_uint8):
        model.eval()
        outs = []
        with torch.no_grad():
            for i in range(0, len(x_uint8), 128):
                xb = x_uint8[i:i + 128].astype(np.float32) / 255.0
                xb = TorchAug.normalize(xb)
                outs.append(model.backbone(torch.tensor(
                    xb.transpose(0, 3, 1, 2))).numpy())
        return np.concatenate(outs)

    return features


def _torch_diag(model, diag_data, epoch):
    """Mid-training probe: kNN top-1 with eval-mode BN (running stats) vs
    train-mode BN (batch stats), plus feature spread — distinguishes
    'features collapsed' from 'running stats drifted'."""
    import copy

    import torch

    xs_tr, ys_tr, xs_te, ys_te = diag_data

    def feats(m, train_bn):
        m = copy.deepcopy(m)
        m.eval()
        if train_bn:
            for mod in m.modules():
                if isinstance(mod, (torch.nn.BatchNorm1d,
                                    torch.nn.BatchNorm2d)):
                    mod.train()
        outs = []
        with torch.no_grad():
            for x in (xs_tr, xs_te):
                for i in range(0, len(x), 128):
                    xb = x[i:i + 128].astype(np.float32) / 255.0
                    xb = TorchAug.normalize(xb)
                    outs.append(m.backbone(torch.tensor(
                        xb.transpose(0, 3, 1, 2))).numpy())
        f = np.concatenate(outs)
        return f[:len(xs_tr)], f[len(xs_tr):]

    import jax.numpy as jnp
    for label, train_bn in (("running-BN", False), ("batch-BN", True)):
        ftr, fte = feats(model, train_bn)
        acc = knn_accuracy(jnp.asarray(ftr), jnp.asarray(ys_tr),
                           jnp.asarray(fte), jnp.asarray(ys_te),
                           k=5, classes=C)
        fn = ftr / (np.linalg.norm(ftr, axis=1, keepdims=True) + 1e-9)
        spread = float(np.linalg.norm(fn - fn.mean(0), axis=1).mean())
        print(f"[torch diag e{epoch}] {label}: top1={acc:.4f} "
              f"feat_std={ftr.std():.4f} unit_spread={spread:.4f}",
              file=sys.stderr)


# ---------------------------------------------------------------------------
# hairci side
# ---------------------------------------------------------------------------

def train_hairci(xs_train, epochs, warmup, seed=0):
    from hairci.utils import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from hairci.aug.pipelines import MultiViewTransform, ViewConfig
    from hairci.ssl import build_recipe

    nb = len(xs_train) // B
    v = ViewConfig(size=SIZE, cj_hue=0.0, blur_kernel=VIEW_BLUR_K)
    recipe = build_recipe(
        "SHAM", backbone=BACKBONE, img_size=SIZE, dtype=jnp.float32,
        warm_up_epochs=warmup, num_batches=nb,
        triplet_w=TRIPLET_W, mse_w=MSE_W,
        transform=MultiViewTransform((v, v)))
    x = jnp.asarray(xs_train)
    state = recipe.create_state(jax.random.key(seed), x[:B])
    step = jax.jit(recipe.train_step, static_argnames="stage")

    k_mined = 7
    t0 = time.perf_counter()
    for e in range(epochs):
        stage = recipe.stage_for_epoch(e)
        viol = 0.0
        for bi in range(nb):
            rng = jax.random.fold_in(jax.random.key(seed + 1), e * nb + bi)
            state, m = step(state, {"image": x[bi * B:(bi + 1) * B]}, rng,
                            stage=stage, batch_id=bi, k=k_mined)
            viol += float(m["margin_violations"])
        if stage == "warmup" and recipe.stage_for_epoch(e + 1) == "mine":
            k_mined = recipe.adapt_k(viol / nb, B)
        print(f"[hairci] epoch {e + 1}/{epochs} stage={stage} "
              f"loss={float(m['loss']):.3f} k={k_mined} "
              f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr)

    feats = jax.jit(recipe.extract_features)

    def features(x_uint8):
        outs = []
        for i in range(0, len(x_uint8), 128):
            outs.append(np.asarray(feats(state, jnp.asarray(
                x_uint8[i:i + 128]))))
        return np.concatenate(outs)

    return features


def _eval(features, xs_tr, ys_tr, xs_te, ys_te):
    import jax.numpy as jnp

    f_tr, f_te = features(xs_tr), features(xs_te)
    return knn_accuracy(jnp.asarray(f_tr), jnp.asarray(ys_tr),
                        jnp.asarray(f_te), jnp.asarray(ys_te), k=5, classes=C)


def main(argv=None):
    global SIZE, N_TRAIN, N_TEST, BACKBONE, B
    global VIEW_BLUR_K, TRIPLET_W, MSE_W, CROSS_AUG, ZERO_INIT_RES
    p = argparse.ArgumentParser()
    p.add_argument("--side", default="both",
                   choices=["both", "torch", "hairci"])
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--warmup", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--size", type=int, default=SIZE)
    p.add_argument("--n_train", type=int, default=N_TRAIN)
    p.add_argument("--n_test", type=int, default=N_TEST,
                   help="eval query count; >=4096 drops the binomial "
                        "accuracy floor to +-0.6pp at 1 sigma (VERDICT r4 "
                        "#2). NOTE: make_dataset permutes over "
                        "n_train+n_test, so runs are only comparable at "
                        "identical (n_train, n_test)")
    p.add_argument("--out", default="/tmp/accuracy_parity.json")
    p.add_argument("--backbone", default="resnet18",
                   choices=["resnet18", "resnet50"],
                   help="resnet50 at --size >= 112 is the headline-scale "
                        "config (VERDICT r2 #5)")
    p.add_argument("--batch", type=int, default=B)
    p.add_argument("--diag_every", type=int, default=0,
                   help="torch side: every N epochs print kNN top-1 under "
                        "running-BN vs batch-BN plus feature spread")
    p.add_argument("--view_blur_k", type=int, default=0,
                   help="pin the SimCLR-view blur kernel on BOTH sides "
                        "(0 = lightly 0.1*size rule)")
    p.add_argument("--simclr_only", action="store_true",
                   help="diagnostic: NT-Xent only (triplet/MSE weights 0, "
                        "mining off) on BOTH sides — isolates the base "
                        "contrastive path from the SHAM extras")
    p.add_argument("--cross_aug", action="store_true",
                   help="diagnostic: torch side trains on hairci's "
                        "augmented views — isolates aug-mirror differences "
                        "from training numerics")
    p.add_argument("--torch_zero_init_residual", action="store_true",
                   help="torch backbone uses hairci's zero-init residual "
                        "BN gammas (matched-init comparison; the reference "
                        "default is gamma=1)")
    args = p.parse_args(argv)
    # honor HAIRCI_PLATFORM for --side torch too: _eval's kNN is jax, and
    # a torch-only background run must not touch the TPU relay
    from hairci.utils import apply_platform_env, enable_compilation_cache

    apply_platform_env()
    enable_compilation_cache()  # hairci-side jits recur across seed runs
    ZERO_INIT_RES = args.torch_zero_init_residual
    BACKBONE, B = args.backbone, args.batch
    SIZE, N_TRAIN, N_TEST = args.size, args.n_train, args.n_test
    VIEW_BLUR_K = args.view_blur_k or None
    CROSS_AUG = args.cross_aug
    if args.simclr_only:
        TRIPLET_W = MSE_W = 0.0
        args.warmup = args.epochs + 2  # stage stays "warmup": no mining

    xs, ys = make_dataset(N_TRAIN + N_TEST, C, SIZE, seed=17)
    xs_tr, ys_tr = xs[:N_TRAIN], ys[:N_TRAIN]
    xs_te, ys_te = xs[N_TRAIN:], ys[N_TRAIN:]

    results = {"config": {"epochs": args.epochs, "warmup": args.warmup,
                          "n_train": N_TRAIN, "n_test": N_TEST,
                          "size": SIZE, "batch": B, "seed": args.seed,
                          "backbone": BACKBONE,
                          "view_blur_k": VIEW_BLUR_K,
                          "torch_zero_init_residual": ZERO_INIT_RES}}
    if args.side in ("both", "torch"):
        f = train_torch(xs_tr, args.epochs, args.warmup, args.seed,
                        diag_data=(xs_tr, ys_tr, xs_te, ys_te),
                        diag_every=args.diag_every)
        results["torch_top1"] = _eval(f, xs_tr, ys_tr, xs_te, ys_te)
        print(f"torch SHAM2-equiv kNN@5 top-1: {results['torch_top1']:.4f}")
    if args.side in ("both", "hairci"):
        f = train_hairci(xs_tr, args.epochs, args.warmup, args.seed)
        results["hairci_top1"] = _eval(f, xs_tr, ys_tr, xs_te, ys_te)
        print(f"hairci SHAM kNN@5 top-1: {results['hairci_top1']:.4f}")
    if "torch_top1" in results and "hairci_top1" in results:
        results["delta"] = results["hairci_top1"] - results["torch_top1"]
        print(f"delta (hairci - torch): {results['delta']:+.4f} "
              f"(band: ±0.005)")
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
