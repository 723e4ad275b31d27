"""Torch → Flax checkpoint converters (SURVEY.md §7 hard-part 6): load
reference-trained PyTorch weights into hairci models for parity validation
and for serving reference checkpoints on TPU.

Supported layouts:
  - torchvision ResNet-18/50 state_dicts (`conv1/bn1/layer{1-4}...`), both
    direct and the `nn.Sequential(*children)` integer-prefixed form SHAM2
    uses (`backbone.0 = conv1`, `backbone.4 = layer1`, ...,
    `/root/reference/HairPretraining/src/main_backbone.py:571-580`),
  - timm/reference ViT (`cls_token/pos_embed/patch_embed.proj/blocks.N.*`,
    `/root/reference/HairPretraining/src/models_vit.py`),
  - lightly SimCLRProjectionHead (`layers.{0,1,3,4}` Linear/BN pairs).

All functions take a `state_dict`-like mapping of numpy arrays (call
`load_torch_state_dict` to read a .pth with torch installed) and return
(params, batch_stats) pytrees matching the hairci Flax modules.
"""

from __future__ import annotations

import logging
import re
from typing import Dict, Mapping, Tuple

import numpy as np

log = logging.getLogger(__name__)

Array = np.ndarray
StateDict = Mapping[str, Array]


def load_torch_state_dict(path: str) -> Dict[str, Array]:
    """Read a .pth into numpy (handles the reference's nested
    {'model_state_dict': ...} checkpoints, `knn_classification.py:124-189`)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model_state_dict", "model", "state_dict"):
        if isinstance(obj, dict) and key in obj:
            obj = obj[key]
            break
    return {k: v.detach().numpy() for k, v in obj.items()
            if hasattr(v, "detach")}


def _conv(w: Array) -> Array:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW → HWIO


def _linear(w: Array) -> Array:
    return np.transpose(w, (1, 0))  # (out, in) → (in, out)


def strip_sequential_resnet_prefix(sd: StateDict,
                                   prefix: str = "backbone.") -> Dict[str, Array]:
    """`nn.Sequential(*resnet.children())` integer names → torchvision names."""
    seq_map = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
               "6": "layer3", "7": "layer4"}
    out = {}
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        rest = k[len(prefix):]
        head, _, tail = rest.partition(".")
        if head in seq_map:
            out[f"{seq_map[head]}.{tail}" if tail else seq_map[head]] = v
    return out


def convert_resnet(sd: StateDict, stage_sizes=(2, 2, 2, 2),
                   bottleneck: bool = False) -> Tuple[dict, dict]:
    """torchvision ResNet state_dict → (params, batch_stats) for
    hairci.models.resnet.ResNet."""
    params: Dict[str, dict] = {}
    stats: Dict[str, dict] = {}

    def put_conv(flax_name: str, torch_name: str):
        params[flax_name] = {"kernel": _conv(sd[f"{torch_name}.weight"])}

    def put_bn(flax_name: str, torch_name: str):
        params[flax_name] = {"scale": sd[f"{torch_name}.weight"],
                             "bias": sd[f"{torch_name}.bias"]}
        stats[flax_name] = {"mean": sd[f"{torch_name}.running_mean"],
                            "var": sd[f"{torch_name}.running_var"]}

    put_conv("conv_init", "conv1")
    put_bn("bn_init", "bn1")
    block_cls = "BottleneckBlock" if bottleneck else "BasicBlock"
    n_convs = 3 if bottleneck else 2
    gi = 0
    for stage, n_blocks in enumerate(stage_sizes, start=1):
        for b in range(n_blocks):
            t = f"layer{stage}.{b}"
            f = f"{block_cls}_{gi}"
            block_p: Dict[str, dict] = {}
            block_s: Dict[str, dict] = {}
            for c in range(n_convs):
                block_p[f"Conv_{c}"] = {
                    "kernel": _conv(sd[f"{t}.conv{c + 1}.weight"])}
                block_p[f"BatchNorm_{c}"] = {
                    "scale": sd[f"{t}.bn{c + 1}.weight"],
                    "bias": sd[f"{t}.bn{c + 1}.bias"]}
                block_s[f"BatchNorm_{c}"] = {
                    "mean": sd[f"{t}.bn{c + 1}.running_mean"],
                    "var": sd[f"{t}.bn{c + 1}.running_var"]}
            if f"{t}.downsample.0.weight" in sd:
                block_p["conv_proj"] = {
                    "kernel": _conv(sd[f"{t}.downsample.0.weight"])}
                block_p["norm_proj"] = {
                    "scale": sd[f"{t}.downsample.1.weight"],
                    "bias": sd[f"{t}.downsample.1.bias"]}
                block_s["norm_proj"] = {
                    "mean": sd[f"{t}.downsample.1.running_mean"],
                    "var": sd[f"{t}.downsample.1.running_var"]}
            params[f] = block_p
            if block_s:
                stats[f] = block_s
            gi += 1
    return params, stats


def convert_vit(sd: StateDict, depth: int = 12,
                global_pool: bool = False) -> Tuple[dict, dict]:
    """timm/reference ViT state_dict → params for
    hairci.models.vit.VisionTransformer."""
    params: Dict[str, dict] = {
        "cls_token": sd["cls_token"].reshape(1, 1, -1),
        "pos_embed": sd["pos_embed"],
        "patch_embed": {"proj": {
            "kernel": _conv(sd["patch_embed.proj.weight"]),
            "bias": sd["patch_embed.proj.bias"],
        }},
    }
    for i in range(depth):
        t = f"blocks.{i}"
        params[f"block{i}"] = {
            "norm1": {"scale": sd[f"{t}.norm1.weight"],
                      "bias": sd[f"{t}.norm1.bias"]},
            "norm2": {"scale": sd[f"{t}.norm2.weight"],
                      "bias": sd[f"{t}.norm2.bias"]},
            "attn": {
                "qkv": {"kernel": _linear(sd[f"{t}.attn.qkv.weight"]),
                        "bias": sd[f"{t}.attn.qkv.bias"]},
                "proj": {"kernel": _linear(sd[f"{t}.attn.proj.weight"]),
                         "bias": sd[f"{t}.attn.proj.bias"]},
            },
            "mlp": {
                "fc1": {"kernel": _linear(sd[f"{t}.mlp.fc1.weight"]),
                        "bias": sd[f"{t}.mlp.fc1.bias"]},
                "fc2": {"kernel": _linear(sd[f"{t}.mlp.fc2.weight"]),
                        "bias": sd[f"{t}.mlp.fc2.bias"]},
            },
        }
    # the hairci ViT owns `norm` always and `fc_norm` when global_pool;
    # fill whichever the checkpoint lacks with an identity LN
    wanted = ["norm"] + (["fc_norm"] if global_pool else [])
    d = params["cls_token"].shape[-1]
    for n in wanted:
        if f"{n}.weight" in sd:
            params[n] = {"scale": sd[f"{n}.weight"], "bias": sd[f"{n}.bias"]}
        else:
            params[n] = {"scale": np.ones((d,), np.float32),
                         "bias": np.zeros((d,), np.float32)}
    return params, {}


def convert_simclr_projection_head(sd: StateDict, prefix: str =
                                   "projection_head.") -> Tuple[dict, dict]:
    """lightly SimCLRProjectionHead (`layers.0` Linear, `layers.1` BN,
    `layers.3` Linear, `layers.4` BN) → hairci MLPHead."""
    params, stats = {}, {}
    for flax_i, (lin, bn) in enumerate((("0", "1"), ("3", "4"))):
        lw = sd.get(f"{prefix}layers.{lin}.weight")
        if lw is None:
            break
        p = {"kernel": _linear(lw)}
        if f"{prefix}layers.{lin}.bias" in sd:
            p["bias"] = sd[f"{prefix}layers.{lin}.bias"]
        params[f"dense{flax_i}"] = p
        if f"{prefix}layers.{bn}.weight" in sd:
            params[f"bn{flax_i}"] = {
                "scale": sd[f"{prefix}layers.{bn}.weight"],
                "bias": sd[f"{prefix}layers.{bn}.bias"]}
            stats[f"bn{flax_i}"] = {
                "mean": sd[f"{prefix}layers.{bn}.running_mean"],
                "var": sd[f"{prefix}layers.{bn}.running_var"]}
    return params, stats


def convert_sham2(sd: StateDict, model: str = "resnet18") -> Tuple[dict, dict]:
    """Reference SHAM2 checkpoint → hairci SHAMModule (params, batch_stats)."""
    backbone_sd = strip_sequential_resnet_prefix(sd, "backbone.")
    stage_sizes = (2, 2, 2, 2) if model == "resnet18" else (3, 4, 6, 3)
    bp, bs = convert_resnet(backbone_sd, stage_sizes,
                            bottleneck=model != "resnet18")
    hp, hs = convert_simclr_projection_head(sd, "projection_head.")
    params = {"backbone": bp, "projection_head": hp}
    stats = {"backbone": bs, "projection_head": hs}
    return params, stats
