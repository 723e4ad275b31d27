"""Torch→Flax converter parity: hand-built torch models (torchvision layout)
vs hairci Flax modules with converted weights."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hairci.models.resnet import build_resnet  # noqa: E402
from hairci.models.vit import build_vit  # noqa: E402
from hairci.retrieval.torch_import import (  # noqa: E402
    convert_resnet,
    convert_sham2,
    convert_simclr_projection_head,
    convert_vit,
    strip_sequential_resnet_prefix,
)


# -----------------------------------------------------------------------------
# torchvision-exact ResNet-18 mirror: shared with
# tools/accuracy_parity.py via tests/torch_fixtures.py
# -----------------------------------------------------------------------------

from torch_fixtures import TorchBasicBlock, TorchResNet18  # noqa: E402,F401


def _randomize_bn_stats(model):
    g = torch.Generator().manual_seed(0)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape,
                                           generator=g) + 0.5)


def test_resnet18_forward_parity():
    torch.manual_seed(0)
    tm = TorchResNet18().eval()
    with torch.no_grad():
        _randomize_bn_stats(tm)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict.__call__().items()}
    params, stats = convert_resnet(sd, (2, 2, 2, 2), bottleneck=False)

    fm = build_resnet("resnet18")
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    out = fm.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


def test_converted_structure_matches_init():
    tm = TorchResNet18()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_resnet(sd, (2, 2, 2, 2))
    fm = build_resnet("resnet18")
    ref = fm.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)

    def shapes(t):
        return jax.tree_util.tree_map(lambda a: jnp.shape(a), t)

    assert shapes(ref["params"]) == shapes(params)
    assert shapes(ref["batch_stats"]) == shapes(stats)


# ---------------------------------------------------------------------------
# ViT block parity (timm layout)
# ---------------------------------------------------------------------------

class TorchViTBlock(tnn.Module):
    def __init__(self, dim=64, heads=4):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.heads = heads

        class Attn(tnn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = tnn.Linear(dim, dim * 3)
                self.proj = tnn.Linear(dim, dim)

        class Mlp(tnn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = tnn.Linear(dim, dim * 4)
                self.fc2 = tnn.Linear(dim * 4, dim)

        self.attn = Attn()
        self.mlp = Mlp()

    def forward(self, x):
        B, N, D = x.shape
        h = self.heads
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(B, N, 3, h, D // h).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q @ k.transpose(-2, -1)) * (D // h) ** -0.5
        a = a.softmax(dim=-1)
        y = (a @ v).transpose(1, 2).reshape(B, N, D)
        x = x + self.attn.proj(y)
        y = self.norm2(x)
        y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(y)))
        return x + y


def test_vit_block_parity():
    from hairci.models.vit import Block

    torch.manual_seed(1)
    tb = TorchViTBlock().eval()
    sd = {f"blocks.0.{k}": v.detach().numpy()
          for k, v in tb.state_dict().items()}
    # reuse convert_vit's block mapping
    dummy = {
        "cls_token": np.zeros((1, 1, 64), np.float32),
        "pos_embed": np.zeros((1, 5, 64), np.float32),
        "patch_embed.proj.weight": np.zeros((64, 3, 16, 16), np.float32),
        "patch_embed.proj.bias": np.zeros((64,), np.float32),
        **sd,
    }
    params, _ = convert_vit(dummy, depth=1)
    x = np.random.default_rng(0).normal(size=(2, 5, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tb(torch.tensor(x)).numpy()
    blk = Block(num_heads=4)
    out = blk.apply({"params": params["block0"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


def test_full_vit_conversion_structure():
    fm = build_vit("vit_tiny_patch16", img_size=32, sincos_pos_embed=False)
    ref = fm.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
    rng = np.random.default_rng(0)

    def r(*shape):
        return rng.normal(size=shape).astype(np.float32)

    d = 192
    sd = {
        "cls_token": r(1, 1, d), "pos_embed": r(1, 5, d),
        "patch_embed.proj.weight": r(d, 3, 16, 16),
        "patch_embed.proj.bias": r(d),
        "norm.weight": r(d), "norm.bias": r(d),
    }
    for i in range(12):
        sd.update({
            f"blocks.{i}.norm1.weight": r(d), f"blocks.{i}.norm1.bias": r(d),
            f"blocks.{i}.norm2.weight": r(d), f"blocks.{i}.norm2.bias": r(d),
            f"blocks.{i}.attn.qkv.weight": r(3 * d, d),
            f"blocks.{i}.attn.qkv.bias": r(3 * d),
            f"blocks.{i}.attn.proj.weight": r(d, d),
            f"blocks.{i}.attn.proj.bias": r(d),
            f"blocks.{i}.mlp.fc1.weight": r(4 * d, d),
            f"blocks.{i}.mlp.fc1.bias": r(4 * d),
            f"blocks.{i}.mlp.fc2.weight": r(d, 4 * d),
            f"blocks.{i}.mlp.fc2.bias": r(d),
        })
    params, _ = convert_vit(sd, depth=12)

    def shapes(t):
        return jax.tree_util.tree_map(lambda a: jnp.shape(a), t)

    assert shapes(ref["params"]) == shapes(params)
    out = fm.apply({"params": params}, jnp.zeros((1, 32, 32, 3)),
                   train=False, pool=True)
    assert np.isfinite(np.asarray(out)).all()


def test_sham2_sequential_prefix_and_head():
    tm = TorchResNet18()
    sd = {}
    # SHAM2 backbone = nn.Sequential(*children): 0=conv1,1=bn1,4..7=layers
    mapping = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
               "layer3": "6", "layer4": "7"}
    for k, v in tm.state_dict().items():
        head, _, tail = k.partition(".")
        sd[f"backbone.{mapping[head]}.{tail}"] = v.detach().numpy()
    # lightly projection head: layers.0 Linear(512,512), 1 BN, 3 Linear, 4 BN
    rng = np.random.default_rng(1)
    sd.update({
        "projection_head.layers.0.weight": rng.normal(size=(512, 512)).astype(np.float32),
        "projection_head.layers.1.weight": np.ones(512, np.float32),
        "projection_head.layers.1.bias": np.zeros(512, np.float32),
        "projection_head.layers.1.running_mean": np.zeros(512, np.float32),
        "projection_head.layers.1.running_var": np.ones(512, np.float32),
        "projection_head.layers.3.weight": rng.normal(size=(128, 512)).astype(np.float32),
        "projection_head.layers.4.weight": np.ones(128, np.float32),
        "projection_head.layers.4.bias": np.zeros(128, np.float32),
        "projection_head.layers.4.running_mean": np.zeros(128, np.float32),
        "projection_head.layers.4.running_var": np.ones(128, np.float32),
    })
    params, stats = convert_sham2(sd, "resnet18")
    assert "backbone" in params and "projection_head" in params
    assert "dense0" in params["projection_head"]
    from hairci.ssl.sham import SHAMModule

    module = SHAMModule(backbone_name="resnet18", img_size=32)
    ref = module.init(jax.random.key(0), jnp.zeros((2, 32, 32, 3)),
                      train=False)

    def shapes(t):
        return jax.tree_util.tree_map(lambda a: jnp.shape(a), t)

    assert shapes(ref["params"]) == shapes(params)
    out = module.apply({"params": params, "batch_stats": stats},
                       jnp.zeros((2, 32, 32, 3)), train=False,
                       method=module.extract_features)
    assert out.shape == (2, 512)


# ---------------------------------------------------------------------------
# torchvision-layout ViT (SimMIM / MSN / ViTWrapper wrap vit_b_16)
# ---------------------------------------------------------------------------

from collections import OrderedDict  # noqa: E402

from hairci.models.vit import VisionTransformer  # noqa: E402
from hairci.retrieval.torch_import import (  # noqa: E402
    convert_densecl,
    convert_dinov2,
    convert_mae,
    convert_msn,
    convert_simclr,
    convert_simmim,
    convert_supcon,
    convert_torchvision_vit,
)


class TVBlock(tnn.Module):
    """torchvision EncoderBlock semantics + key names."""

    def __init__(self, d, h):
        super().__init__()
        self.ln_1 = tnn.LayerNorm(d, eps=1e-6)
        self.self_attention = tnn.MultiheadAttention(d, h, batch_first=True)
        self.ln_2 = tnn.LayerNorm(d, eps=1e-6)
        self.mlp = tnn.Sequential(
            tnn.Linear(d, 4 * d), tnn.GELU(), tnn.Dropout(0.0),
            tnn.Linear(4 * d, d), tnn.Dropout(0.0))

    def forward(self, x):
        y = self.ln_1(x)
        y, _ = self.self_attention(y, y, y, need_weights=False)
        x = x + y
        return x + self.mlp(self.ln_2(x))


class TVEncoder(tnn.Module):
    def __init__(self, d, h, depth, n_tokens):
        super().__init__()
        self.pos_embedding = tnn.Parameter(torch.randn(1, n_tokens, d) * 0.02)
        self.layers = tnn.Sequential(OrderedDict(
            (f"encoder_layer_{i}", TVBlock(d, h)) for i in range(depth)))
        self.ln = tnn.LayerNorm(d, eps=1e-6)

    def forward(self, x):
        return self.ln(self.layers(x + self.pos_embedding))


class TVViT(tnn.Module):
    """Minimal torchvision VisionTransformer (CLS-token output)."""

    def __init__(self, d=64, h=4, depth=2, patch=16, img=32):
        super().__init__()
        self.conv_proj = tnn.Conv2d(3, d, patch, patch)
        self.class_token = tnn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.encoder = TVEncoder(d, h, depth, (img // patch) ** 2 + 1)

    def forward(self, x):
        n = x.shape[0]
        x = self.conv_proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.class_token.expand(n, -1, -1), x], dim=1)
        return self.encoder(x)[:, 0]


def test_torchvision_vit_forward_parity():
    torch.manual_seed(2)
    tm = TVViT().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, _ = convert_torchvision_vit(sd, depth=2)
    fm = VisionTransformer(patch_size=16, embed_dim=64, depth=2, num_heads=4,
                           img_size=32, sincos_pos_embed=False)
    x = np.random.default_rng(3).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    out = fm.apply({"params": params}, jnp.asarray(x), train=False, pool=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# synthetic reference state_dict generators (timm / torchvision layouts)
# ---------------------------------------------------------------------------

def _timm_vit_sd(rng, d, depth, n_tokens, prefix="", ls=False):
    def r(*shape):
        return rng.normal(size=shape).astype(np.float32) * 0.02

    sd = {
        f"{prefix}cls_token": r(1, 1, d),
        f"{prefix}pos_embed": r(1, n_tokens, d),
        f"{prefix}patch_embed.proj.weight": r(d, 3, 16, 16),
        f"{prefix}patch_embed.proj.bias": r(d),
        f"{prefix}norm.weight": np.ones(d, np.float32),
        f"{prefix}norm.bias": np.zeros(d, np.float32),
    }
    for i in range(depth):
        t = f"{prefix}blocks.{i}"
        sd.update({
            f"{t}.norm1.weight": np.ones(d, np.float32),
            f"{t}.norm1.bias": np.zeros(d, np.float32),
            f"{t}.norm2.weight": np.ones(d, np.float32),
            f"{t}.norm2.bias": np.zeros(d, np.float32),
            f"{t}.attn.qkv.weight": r(3 * d, d),
            f"{t}.attn.qkv.bias": r(3 * d),
            f"{t}.attn.proj.weight": r(d, d),
            f"{t}.attn.proj.bias": r(d),
            f"{t}.mlp.fc1.weight": r(4 * d, d),
            f"{t}.mlp.fc1.bias": r(4 * d),
            f"{t}.mlp.fc2.weight": r(d, 4 * d),
            f"{t}.mlp.fc2.bias": r(d),
        })
        if ls:
            sd[f"{t}.ls1.gamma"] = np.full(d, 1e-5, np.float32)
            sd[f"{t}.ls2.gamma"] = np.full(d, 1e-5, np.float32)
    return sd


def _tv_vit_sd(rng, d, depth, n_tokens, prefix=""):
    def r(*shape):
        return rng.normal(size=shape).astype(np.float32) * 0.02

    sd = {
        f"{prefix}class_token": r(1, 1, d),
        f"{prefix}conv_proj.weight": r(d, 3, 16, 16),
        f"{prefix}conv_proj.bias": r(d),
        f"{prefix}encoder.pos_embedding": r(1, n_tokens, d),
        f"{prefix}encoder.ln.weight": np.ones(d, np.float32),
        f"{prefix}encoder.ln.bias": np.zeros(d, np.float32),
    }
    for i in range(depth):
        t = f"{prefix}encoder.layers.encoder_layer_{i}"
        sd.update({
            f"{t}.ln_1.weight": np.ones(d, np.float32),
            f"{t}.ln_1.bias": np.zeros(d, np.float32),
            f"{t}.ln_2.weight": np.ones(d, np.float32),
            f"{t}.ln_2.bias": np.zeros(d, np.float32),
            f"{t}.self_attention.in_proj_weight": r(3 * d, d),
            f"{t}.self_attention.in_proj_bias": r(3 * d),
            f"{t}.self_attention.out_proj.weight": r(d, d),
            f"{t}.self_attention.out_proj.bias": r(d),
            f"{t}.mlp.0.weight": r(4 * d, d),
            f"{t}.mlp.0.bias": r(4 * d),
            f"{t}.mlp.3.weight": r(d, 4 * d),
            f"{t}.mlp.3.bias": r(d),
        })
    return sd


def _lightly_head_sd(rng, prefix, dims, bn_after):
    """dims: [(in, out)] per Linear; bn_after: aligned bools.
    Sequential index advances by 1 for Linear, +1 if BN, +1 if act (act on
    all but the last block, matching lightly's flattening)."""
    def r(*shape):
        return rng.normal(size=shape).astype(np.float32) * 0.05

    sd, idx = {}, 0
    for j, ((din, dout), bn) in enumerate(zip(dims, bn_after)):
        sd[f"{prefix}layers.{idx}.weight"] = r(dout, din)
        if not bn:
            sd[f"{prefix}layers.{idx}.bias"] = r(dout)
        idx += 1
        if bn:
            sd[f"{prefix}layers.{idx}.weight"] = np.ones(dout, np.float32)
            sd[f"{prefix}layers.{idx}.bias"] = np.zeros(dout, np.float32)
            sd[f"{prefix}layers.{idx}.running_mean"] = np.zeros(dout,
                                                                np.float32)
            sd[f"{prefix}layers.{idx}.running_var"] = np.ones(dout,
                                                              np.float32)
            idx += 1
        if j < len(dims) - 1:
            idx += 1  # activation module
    return sd


def _shapes(t):
    return jax.tree_util.tree_map(lambda a: jnp.shape(a), t)


def test_convert_msn_structure_and_apply():
    from hairci.ssl.msn import MSNModule

    rng = np.random.default_rng(4)
    d, depth, grid = 192, 12, 2
    sd = {}
    for b in ("backbone.vit.", "anchor_backbone.vit."):
        sd.update(_tv_vit_sd(rng, d, depth, grid * grid + 1, prefix=b))
    for h in ("projection_head.", "anchor_projection_head."):
        sd.update(_lightly_head_sd(
            rng, h, [(d, 2048), (2048, 2048), (2048, 256)],
            [True, True, False]))
    sd["prototypes"] = rng.normal(size=(1024, 256)).astype(np.float32)

    params, stats, emap, emas = convert_msn(sd, depth=depth)
    module = MSNModule(backbone_name="vit_tiny_patch16", img_size=32)
    ref = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                      train=True, method=module.encode)
    assert _shapes(ref["params"]) == _shapes(params)
    assert _shapes(ref["params"]) == _shapes(emap)
    assert _shapes(ref["batch_stats"]) == _shapes(stats)
    out = module.apply({"params": emap, "batch_stats": emas},
                       jnp.zeros((1, 32, 32, 3)), train=False,
                       method=module.extract_features)
    assert out.shape == (1, d) and np.isfinite(np.asarray(out)).all()


def test_convert_densecl_structure_and_apply():
    from hairci.ssl.densecl import DenseCLModule

    rng = np.random.default_rng(5)
    # resnet50 children[:-2] state dict: build shapes from the hairci init
    module = DenseCLModule(backbone_name="resnet50")
    ref = module.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                      train=False)
    # synthesize torch keys for the backbone from torchvision resnet50 names
    sd = {}
    seq = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
           "layer3": "6", "layer4": "7"}

    def put_bn(t, c):
        sd[f"{t}.weight"] = np.ones(c, np.float32)
        sd[f"{t}.bias"] = np.zeros(c, np.float32)
        sd[f"{t}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{t}.running_var"] = np.ones(c, np.float32)

    for suffix in ("", "_momentum"):
        p = f"backbone{suffix}."
        sd[f"{p}0.weight"] = rng.normal(size=(64, 3, 7, 7)).astype(np.float32)
        put_bn(f"{p}1", 64)
        stage_sizes = [3, 4, 6, 3]
        cin = 64
        for s, n in enumerate(stage_sizes):
            width = 64 * 2 ** s
            for b in range(n):
                t = f"{p}{seq[f'layer{s + 1}']}.{b}"
                sd[f"{t}.conv1.weight"] = rng.normal(
                    size=(width, cin, 1, 1)).astype(np.float32)
                put_bn(f"{t}.bn1", width)
                sd[f"{t}.conv2.weight"] = rng.normal(
                    size=(width, width, 3, 3)).astype(np.float32)
                put_bn(f"{t}.bn2", width)
                sd[f"{t}.conv3.weight"] = rng.normal(
                    size=(width * 4, width, 1, 1)).astype(np.float32)
                put_bn(f"{t}.bn3", width * 4)
                if b == 0:
                    sd[f"{t}.downsample.0.weight"] = rng.normal(
                        size=(width * 4, cin, 1, 1)).astype(np.float32)
                    put_bn(f"{t}.downsample.1", width * 4)
                cin = width * 4
        for h in (f"projection_head_global{suffix}.",
                  f"projection_head_local{suffix}."):
            sd.update(_lightly_head_sd(rng, h, [(2048, 2048), (2048, 512)],
                                       [False, False]))

    params, stats, emap, emas = convert_densecl(sd)
    assert _shapes(ref["params"]) == _shapes(params)
    assert _shapes(ref["params"]) == _shapes(emap)
    assert _shapes(ref["batch_stats"]) == _shapes(stats)
    out = module.apply({"params": params, "batch_stats": stats},
                       jnp.zeros((1, 64, 64, 3)), train=False,
                       method=module.extract_features)
    assert out.shape == (1, 2048)


def test_convert_mae_structure():
    from hairci.ssl.mae import MAEModule

    rng = np.random.default_rng(6)
    d, depth, grid = 192, 12, 2
    sd = _timm_vit_sd(rng, d, depth, grid * grid + 1, prefix="backbone.vit.")
    # lightly MAEDecoderTIMM keys
    dd = 512
    sd.update({
        "decoder.decoder_embed.weight": rng.normal(size=(dd, d)).astype(
            np.float32),
        "decoder.decoder_embed.bias": np.zeros(dd, np.float32),
        "decoder.mask_token": np.zeros((1, 1, dd), np.float32),
        "decoder.decoder_norm.weight": np.ones(dd, np.float32),
        "decoder.decoder_norm.bias": np.zeros(dd, np.float32),
        "decoder.decoder_pred.weight": rng.normal(
            size=(16 * 16 * 3, dd)).astype(np.float32),
        "decoder.decoder_pred.bias": np.zeros(16 * 16 * 3, np.float32),
    })
    blk = _timm_vit_sd(rng, dd, 8, 1, prefix="decoder_tmp.")
    for k, v in blk.items():
        if ".blocks." in k:
            sd[k.replace("decoder_tmp.blocks.",
                         "decoder.decoder_blocks.")] = v

    params, _ = convert_mae(sd, depth=depth, decoder_depth=8)
    module = MAEModule(backbone_name="vit_tiny_patch16", img_size=32)
    N = grid * grid
    ids_keep = jnp.zeros((1, 1), jnp.int32)
    ids_restore = jnp.tile(jnp.arange(N), (1, 1))
    ref = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                      ids_keep, ids_restore, train=False)
    assert _shapes(ref["params"]) == _shapes(params)


def test_convert_simmim_structure_and_apply():
    from hairci.ssl.simmim import SimMIMModule

    rng = np.random.default_rng(7)
    d, depth, grid = 192, 12, 2
    sd = _tv_vit_sd(rng, d, depth, grid * grid + 1, prefix="backbone.vit.")
    sd["decoder.weight"] = rng.normal(size=(16 * 16 * 3, d)).astype(
        np.float32)
    sd["decoder.bias"] = np.zeros(16 * 16 * 3, np.float32)

    params, _ = convert_simmim(sd, depth=depth)
    module = SimMIMModule(backbone_name="vit_tiny_patch16", img_size=32)
    mask = jnp.zeros((1, grid * grid), bool)
    ref = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), mask,
                      train=False)
    assert _shapes(ref["params"]) == _shapes(params)
    out = module.apply({"params": params}, jnp.zeros((1, 32, 32, 3)),
                       train=False, method=module.extract_features)
    assert out.shape == (1, d)


def test_convert_dinov2_structure_and_apply():
    from hairci.ssl.dinov2 import DINOv2Module

    rng = np.random.default_rng(8)
    d, depth, grid = 192, 12, 2
    sd = {}
    for b in ("student_backbone.vit.", "teacher_backbone.vit."):
        sd.update(_timm_vit_sd(rng, d, depth, grid * grid + 1, prefix=b,
                               ls=True))
    for h in ("student_head.dino_head.", "teacher_head.dino_head."):
        sd.update(_lightly_head_sd(rng, h, [(d, 2048), (2048, 2048),
                                            (2048, 256)],
                                   [False, False, False]))
        # torch weight_norm: old naming
        sd[f"{h}last_layer.weight_g"] = np.ones((512, 1), np.float32)
        sd[f"{h}last_layer.weight_v"] = rng.normal(size=(512, 256)).astype(
            np.float32)

    params, emap = convert_dinov2(sd, depth=depth)
    module = DINOv2Module(backbone_name="vit_tiny_patch16", img_size=32,
                          head_out=512)
    v = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=True,
                    method=module.forward_tokens)
    v2 = module.init(jax.random.key(1), jnp.zeros((2, d)),
                     method=module.cls_logits)
    ref = {**v["params"], **v2["params"]}
    assert _shapes(ref) == _shapes(params)
    assert _shapes(ref) == _shapes(emap)
    out = module.apply({"params": params}, jnp.zeros((1, 32, 32, 3)),
                       train=False, method=module.extract_features)
    assert out.shape == (1, d) and np.isfinite(np.asarray(out)).all()


def test_convert_simclr_resnet_forward_parity():
    from hairci.ssl.simclr import SimCLRModule

    torch.manual_seed(9)
    tm = TorchResNet18().eval()
    with torch.no_grad():
        _randomize_bn_stats(tm)
    sd = {}
    mapping = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
               "layer3": "6", "layer4": "7"}
    for k, v in tm.state_dict().items():
        head, _, tail = k.partition(".")
        sd[f"backbone.{mapping[head]}.{tail}"] = v.detach().numpy()
    rng = np.random.default_rng(10)
    sd.update(_lightly_head_sd(rng, "projection_head.",
                               [(512, 512), (512, 128)], [True, True]))

    params, stats = convert_simclr(sd, "resnet18")
    module = SimCLRModule(backbone_name="resnet18")
    x = np.random.default_rng(11).normal(size=(2, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    out = module.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), train=False,
                       method=module.extract_features)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


class TorchCifarBasicBlock(tnn.Module):
    """Reference from-scratch BasicBlock (`backbone.py:247-274`): stride on
    conv1, `shortcut.{0,1}` projection."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.shortcut = tnn.Sequential()
        if stride != 1 or cin != cout:
            self.shortcut = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + self.shortcut(x))


class TorchCifarResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 3, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        cin = 64
        layers = []
        for stage, cout in enumerate([64, 128, 256, 512]):
            blocks = []
            for b in range(2):
                stride = 2 if stage > 0 and b == 0 else 1
                blocks.append(TorchCifarBasicBlock(cin, cout, stride))
                cin = cout
            layers.append(tnn.Sequential(*blocks))
        self.layer1, self.layer2, self.layer3, self.layer4 = layers

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        return x.mean(dim=(2, 3))


def test_convert_supcon_forward_parity():
    from hairci.ssl.supcon import SupConModule

    torch.manual_seed(12)
    tm = TorchCifarResNet18().eval()
    with torch.no_grad():
        _randomize_bn_stats(tm)
    sd = {f"encoder.{k}": v.detach().numpy()
          for k, v in tm.state_dict().items()}
    rng = np.random.default_rng(13)
    sd["head.0.weight"] = rng.normal(size=(512, 512)).astype(np.float32)
    sd["head.0.bias"] = np.zeros(512, np.float32)
    sd["head.2.weight"] = rng.normal(size=(128, 512)).astype(np.float32)
    sd["head.2.bias"] = np.zeros(128, np.float32)

    params, stats = convert_supcon(sd, "resnet18")
    module = SupConModule(backbone_name="resnet18")
    x = np.random.default_rng(14).normal(size=(2, 32, 32, 3)).astype(
        np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    out = module.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), train=False,
                       method=module.extract_features)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


class TorchSiamEncoder(tnn.Module):
    """SiameseIMViT online-encoder eval path (`backbone.py:1699-1720`):
    patch embed + pos + cls, timm blocks, NO final norm, raw cls out."""

    def __init__(self, d=64, h=4, depth=2, patch=16, img=32):
        super().__init__()
        n = (img // patch) ** 2
        self.proj = tnn.Conv2d(3, d, patch, patch)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, n + 1, d) * 0.02,
                                       requires_grad=False)
        self.blocks = tnn.ModuleList(TorchViTBlock(d, h) for _ in range(depth))

    def forward(self, x):
        x = self.proj(x).flatten(2).transpose(1, 2)
        x = x + self.pos_embed[:, 1:]
        cls = self.cls_token.expand(x.shape[0], -1, -1) + self.pos_embed[:, :1]
        x = torch.cat([cls, x], dim=1)
        for blk in self.blocks:
            x = blk(x)
        return x[:, 0]


def test_convert_siameseim_encoder_parity():
    from hairci.models.vit import VisionTransformer
    from hairci.retrieval.torch_import import convert_siameseim, merge_params

    torch.manual_seed(15)
    tm = TorchSiamEncoder().eval()
    def fix(k):
        return "patch_embed." + k if k.startswith("proj.") else k

    sd = {}
    for k, v in tm.state_dict().items():
        sd[fix(k)] = v.detach().numpy()
    # momentum copies (different weights, to check branch separation);
    # pos_embed is the shared fixed sincos buffer in the reference
    tm2 = TorchSiamEncoder().eval()
    with torch.no_grad():
        tm2.pos_embed.copy_(tm.pos_embed)
    for k, v in tm2.state_dict().items():
        if k == "pos_embed":
            continue
        sd["mm_" + fix(k)] = v.detach().numpy()

    params, _stats, emap, _emastats = convert_siameseim(sd, depth=2)
    fm = VisionTransformer(patch_size=16, embed_dim=64, depth=2, num_heads=4,
                           img_size=32, sincos_pos_embed=False,
                           final_norm=False)
    x = np.random.default_rng(16).normal(size=(2, 32, 32, 3)).astype(
        np.float32)
    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    with torch.no_grad():
        ref_online = tm(xt).numpy()
        ref_mm = tm2(xt).numpy()
    out_online = fm.apply({"params": params["encoder"]}, jnp.asarray(x),
                          train=False, pool=True)
    np.testing.assert_allclose(np.asarray(out_online), ref_online,
                               rtol=1e-3, atol=1e-4)
    out_mm = fm.apply({"params": emap["encoder"]}, jnp.asarray(x),
                      train=False, pool=True)
    np.testing.assert_allclose(np.asarray(out_mm), ref_mm,
                               rtol=1e-3, atol=1e-4)
    # merge over an init tree keeps unmatched leaves intact
    init = fm.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                   train=False)["params"]
    merged = merge_params({"encoder": init}, params)
    assert _shapes(merged["encoder"]) == _shapes(init)


# ---------------------------------------------------------------------------
# face ViT (einops layout, `vit_face.py:257-404`)
# ---------------------------------------------------------------------------

class _TFPreNorm(tnn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.norm = tnn.LayerNorm(dim)
        self.fn = fn

    def forward(self, x):
        return self.fn(self.norm(x))


class _TFResidual(tnn.Module):
    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def forward(self, x):
        return self.fn(x) + x


class _TFAttention(tnn.Module):
    def __init__(self, dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        self.scale = dim ** -0.5  # reference quirk: MODEL dim
        self.to_qkv = tnn.Linear(dim, inner * 3, bias=False)
        self.to_out = tnn.Sequential(tnn.Linear(inner, dim))

    def forward(self, x):
        b, n, _ = x.shape
        h = self.heads
        q, k, v = self.to_qkv(x).chunk(3, dim=-1)

        def split(t):
            return t.reshape(b, n, h, -1).transpose(1, 2)

        q, k, v = split(q), split(k), split(v)
        dots = (q @ k.transpose(-2, -1)) * self.scale
        out = dots.softmax(dim=-1) @ v
        out = out.transpose(1, 2).reshape(b, n, -1)
        return self.to_out(out)


class _TFFeedForward(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.net = tnn.Sequential(
            tnn.Linear(dim, hidden), tnn.GELU(), tnn.Dropout(0.0),
            tnn.Linear(hidden, dim), tnn.Dropout(0.0))

    def forward(self, x):
        return self.net(x)


class TorchViTFace(tnn.Module):
    def __init__(self, img=32, patch=8, dim=64, depth=2, heads=4,
                 dim_head=16, mlp_dim=128, num_class=10):
        super().__init__()
        n = (img // patch) ** 2
        self.patch = patch
        self.pos_embedding = tnn.Parameter(torch.randn(1, n + 1, dim))
        self.patch_to_embedding = tnn.Linear(patch * patch * 3, dim)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim))
        layers = []
        for _ in range(depth):
            layers.append(tnn.ModuleList([
                _TFResidual(_TFPreNorm(dim, _TFAttention(dim, heads,
                                                         dim_head))),
                _TFResidual(_TFPreNorm(dim, _TFFeedForward(dim, mlp_dim))),
            ]))
        self.transformer = tnn.Module()
        self.transformer.layers = tnn.ModuleList(layers)
        self.mlp_head = tnn.Sequential(tnn.LayerNorm(dim))

        class _Loss(tnn.Module):
            def __init__(self):
                super().__init__()
                self.weight = tnn.Parameter(torch.randn(num_class, dim))

        self.loss = _Loss()

    def forward(self, img):
        p = self.patch
        B, C, H, W = img.shape
        x = img.reshape(B, C, H // p, p, W // p, p)
        x = x.permute(0, 2, 4, 3, 5, 1).reshape(B, -1, p * p * C)
        x = self.patch_to_embedding(x)
        cls = self.cls_token.expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embedding
        for attn, ff in self.transformer.layers:
            x = ff(attn(x))
        return self.mlp_head(x[:, 0])


def test_convert_vit_face_forward_parity():
    from hairci.models.face_vit import ViTFace
    from hairci.retrieval.torch_import import convert_vit_face

    torch.manual_seed(17)
    tm = TorchViTFace().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, _ = convert_vit_face(sd, depth=2)
    fm = ViTFace(image_size=32, patch_size=8, dim=64, depth=2, heads=4,
                 dim_head=16, mlp_dim=128, num_class=10)
    x = np.random.default_rng(18).normal(
        size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    out = fm.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# export (hairci → torch) roundtrips
# ---------------------------------------------------------------------------

def test_export_resnet_roundtrip():
    from hairci.retrieval.torch_import import export_resnet

    fm = build_resnet("resnet18")
    v = fm.init(jax.random.key(3), jnp.zeros((1, 32, 32, 3)), train=False)
    sd = export_resnet(v["params"], v["batch_stats"], (2, 2, 2, 2))
    params, stats = convert_resnet(sd, (2, 2, 2, 2))
    for a, b in zip(jax.tree_util.tree_leaves(v["params"]),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(v["batch_stats"]),
                    jax.tree_util.tree_leaves(stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_vit_roundtrip():
    from hairci.retrieval.torch_import import export_vit

    fm = build_vit("vit_tiny_patch16", img_size=32, sincos_pos_embed=False)
    v = fm.init(jax.random.key(4), jnp.zeros((1, 32, 32, 3)), train=False)
    sd = export_vit(v["params"], depth=12)
    params, _ = convert_vit(sd, depth=12)

    def flat(t):
        return {jax.tree_util.keystr(k): np.asarray(a) for k, a in
                jax.tree_util.tree_leaves_with_path(t)}

    a, b = flat(v["params"]), flat(params)
    assert sorted(a) == sorted(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_export_sham2_loads_in_reference_layout(tmp_path):
    from hairci.retrieval.torch_import import (
        export_sham2,
        load_torch_state_dict,
        save_torch_state_dict,
    )
    from hairci.ssl.sham import SHAMModule

    module = SHAMModule(backbone_name="resnet18", img_size=32)
    v = module.init(jax.random.key(5), jnp.zeros((2, 32, 32, 3)),
                    train=False)
    sd = export_sham2(v["params"], v["batch_stats"], "resnet18")
    # write as .pth and read back through the normal import path
    path = str(tmp_path / "sham_export.pth")
    save_torch_state_dict(sd, path)
    rd = load_torch_state_dict(path)
    params, stats = convert_sham2(rd, "resnet18")
    out_a = module.apply({"params": v["params"],
                          "batch_stats": v["batch_stats"]},
                         jnp.ones((1, 32, 32, 3)), train=False,
                         method=module.extract_features)
    out_b = module.apply({"params": params, "batch_stats": stats},
                         jnp.ones((1, 32, 32, 3)), train=False,
                         method=module.extract_features)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_convert_siameseim_permutebn_decoder_structure():
    """Decoder-stack conversion (PermuteBN norm layout) produces exactly the
    shapes SiameseIMModule initializes — params AND running stats, online
    and mm branches (`backbone.py:1268-1303,1318-1372`)."""
    from hairci.retrieval.torch_import import convert_siameseim, merge_params
    from hairci.ssl import build_recipe

    torch.manual_seed(33)
    d_enc, dec = 192, 64
    rng = np.random.default_rng(34)

    def rnd(*shape):
        return rng.normal(size=shape).astype(np.float32)

    enc = TorchSiamEncoder(d=d_enc, h=3, depth=12)

    def fix(k):
        return "patch_embed." + k if k.startswith("proj.") else k

    sd = {fix(k): v.detach().numpy() for k, v in enc.state_dict().items()}
    for k, v in enc.state_dict().items():
        if k != "pos_embed":
            sd["mm_" + fix(k)] = v.detach().numpy()

    def dec_block(prefix):
        sd[f"{prefix}.attn.qkv.weight"] = rnd(3 * dec, dec)
        sd[f"{prefix}.attn.qkv.bias"] = rnd(3 * dec)
        sd[f"{prefix}.attn.proj.weight"] = rnd(dec, dec)
        sd[f"{prefix}.attn.proj.bias"] = rnd(dec)
        sd[f"{prefix}.mlp.fc1.weight"] = rnd(4 * dec, dec)
        sd[f"{prefix}.mlp.fc1.bias"] = rnd(4 * dec)
        sd[f"{prefix}.mlp.fc2.weight"] = rnd(dec, 4 * dec)
        sd[f"{prefix}.mlp.fc2.bias"] = rnd(dec)
        for n in ("norm1", "norm2"):
            sd[f"{prefix}.{n}.bn.weight"] = rnd(dec)
            sd[f"{prefix}.{n}.bn.bias"] = rnd(dec)
            sd[f"{prefix}.{n}.bn.running_mean"] = rnd(dec)
            sd[f"{prefix}.{n}.bn.running_var"] = np.abs(rnd(dec)) + 0.5

    for side in ("", "mm_"):
        sd[f"{side}decoder_embed.weight"] = rnd(dec, d_enc)
        sd[f"{side}decoder_embed.bias"] = rnd(dec)
        sd[f"{side}mask_token"] = rnd(1, 1, dec)
        dec_block(f"{side}projector_decoder_blocks.0")
    dec_block("predictor_decoder_blocks.0")
    dec_block("predictor_decoder_blocks.1")
    sd["decoder_pred.weight"] = rnd(dec, dec)
    sd["decoder_pred.bias"] = rnd(dec)
    sd["decoder_pos_mlp.weight"] = rnd(dec, 2 * dec)
    sd["decoder_pos_mlp.bias"] = rnd(dec)

    params, stats, emap, emastats = convert_siameseim(sd, depth=12)
    r = build_recipe("siameseim", backbone="vit_tiny_patch16", img_size=32,
                     dtype=jnp.float32, decoder_dim=dec, decoder_num_heads=4,
                     projector_depth=1, predictor_depth=2)
    imgs = jnp.asarray(np.zeros((2, 48, 48, 3), np.uint8))
    state = r.create_state(jax.random.key(0), imgs)

    def shapes(t):
        return jax.tree_util.tree_map(lambda a: jnp.shape(a), t)

    merged = merge_params(state.params, params)
    assert shapes(merged) == shapes(state.params)
    merged_bs = merge_params(state.batch_stats, stats)
    assert shapes(merged_bs) == shapes(state.batch_stats)
    # the converted subtrees actually landed (not silently dropped)
    for key in ("decoder_embed", "projector_blocks_0", "predictor_blocks_1",
                "decoder_pred", "decoder_pos_mlp"):
        assert key in params, key
    assert "projector_blocks_0" in stats and "norm1" in stats["projector_blocks_0"]
    assert "projector_blocks_0" in emap and "projector_blocks_0" in emastats
    # mm branch: exactly encoder + projector, no predictor (backbone.py:1345-1367)
    assert "predictor_blocks_0" not in emap


def test_siameseim_block_norm_detection():
    """`siameseim_block_norm` picks the module layout the checkpoint needs
    (the eval CLI rebuilds its recipe from this — an LN-variant checkpoint
    merged into a PermuteBN-initialized tree is corrupt)."""
    from hairci.retrieval.torch_import import siameseim_block_norm

    bn = {"projector_decoder_blocks.0.norm1.bn.weight": 0,
          "predictor_decoder_blocks.0.norm1.bn.weight": 0}
    ln = {"projector_decoder_blocks.0.norm1.weight": 0,
          "predictor_decoder_blocks.0.norm1.weight": 0}
    assert siameseim_block_norm(bn) == "permute_bn"
    assert siameseim_block_norm(ln) == "ln"
    assert siameseim_block_norm({"blocks.0.norm1.weight": 0}) == "permute_bn"
    with pytest.raises(ValueError, match="mixes"):
        siameseim_block_norm({**bn, **ln})


def test_convert_siameseim_ln_decoder_matches_ln_module():
    """LN-variant decoder conversion merges cleanly into a module built
    with block_norm='ln' (use_proj_ln/use_pred_ln, backbone.py:1280-1292)."""
    from hairci.retrieval.torch_import import (
        convert_siameseim, merge_params, siameseim_block_norm)
    from hairci.ssl import build_recipe

    d_enc, dec = 192, 64
    rng = np.random.default_rng(44)

    def rnd(*shape):
        return rng.normal(size=shape).astype(np.float32)

    enc = TorchSiamEncoder(d=d_enc, h=3, depth=12)

    def fix(k):
        return "patch_embed." + k if k.startswith("proj.") else k

    sd = {fix(k): v.detach().numpy() for k, v in enc.state_dict().items()}
    for k, v in enc.state_dict().items():
        if k != "pos_embed":
            sd["mm_" + fix(k)] = v.detach().numpy()

    def dec_block(prefix):
        sd[f"{prefix}.attn.qkv.weight"] = rnd(3 * dec, dec)
        sd[f"{prefix}.attn.qkv.bias"] = rnd(3 * dec)
        sd[f"{prefix}.attn.proj.weight"] = rnd(dec, dec)
        sd[f"{prefix}.attn.proj.bias"] = rnd(dec)
        sd[f"{prefix}.mlp.fc1.weight"] = rnd(4 * dec, dec)
        sd[f"{prefix}.mlp.fc1.bias"] = rnd(4 * dec)
        sd[f"{prefix}.mlp.fc2.weight"] = rnd(dec, 4 * dec)
        sd[f"{prefix}.mlp.fc2.bias"] = rnd(dec)
        for n in ("norm1", "norm2"):  # LayerNorm layout
            sd[f"{prefix}.{n}.weight"] = rnd(dec)
            sd[f"{prefix}.{n}.bias"] = rnd(dec)

    for side in ("", "mm_"):
        sd[f"{side}decoder_embed.weight"] = rnd(dec, d_enc)
        sd[f"{side}decoder_embed.bias"] = rnd(dec)
        sd[f"{side}mask_token"] = rnd(1, 1, dec)
        dec_block(f"{side}projector_decoder_blocks.0")
    dec_block("predictor_decoder_blocks.0")
    dec_block("predictor_decoder_blocks.1")
    sd["decoder_pred.weight"] = rnd(dec, dec)
    sd["decoder_pred.bias"] = rnd(dec)
    sd["decoder_pos_mlp.weight"] = rnd(dec, 2 * dec)
    sd["decoder_pos_mlp.bias"] = rnd(dec)

    assert siameseim_block_norm(sd) == "ln"
    params, stats, emap, emastats = convert_siameseim(sd, depth=12)
    r = build_recipe("siameseim", backbone="vit_tiny_patch16", img_size=32,
                     dtype=jnp.float32, decoder_dim=dec, decoder_num_heads=4,
                     projector_depth=1, predictor_depth=2, block_norm="ln")
    imgs = jnp.asarray(np.zeros((2, 48, 48, 3), np.uint8))
    state = r.create_state(jax.random.key(0), imgs)

    def shapes(t):
        return jax.tree_util.tree_map(lambda a: jnp.shape(a), t)

    merged = merge_params(state.params, params)
    assert shapes(merged) == shapes(state.params)
    assert "projector_blocks_0" in params
    assert not stats.get("projector_blocks_0")  # LN carries no running stats
