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


# ---------------------------------------------------------------------------
# torchvision-exact ResNet-18 (hand-built: torchvision isn't installed)
# ---------------------------------------------------------------------------

class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + idt)


class TorchResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        layers = []
        cin = 64
        for stage, cout in enumerate([64, 128, 256, 512]):
            blocks = []
            for b in range(2):
                stride = 2 if stage > 0 and b == 0 else 1
                blocks.append(TorchBasicBlock(cin, cout, stride))
                cin = cout
            layers.append(tnn.Sequential(*blocks))
        self.layer1, self.layer2, self.layer3, self.layer4 = layers

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        return x.mean(dim=(2, 3))


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
        y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(y),
                                                  approximate="tanh"))
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
