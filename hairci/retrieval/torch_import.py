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


def _sub(sd: StateDict, prefix: str) -> Dict[str, Array]:
    """Sub-state-dict under ``prefix`` (prefix stripped)."""
    return {k[len(prefix):]: v for k, v in sd.items()
            if k.startswith(prefix)}


def _timm_block(sd: StateDict, t: str) -> dict:
    """One timm ViT block (`blocks.N.` keys) → hairci Block params.
    Picks up LayerScale (`ls1/ls2.gamma`, DINOv2's init_values ViTs) when
    present."""
    p = {
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
    for ls in ("ls1", "ls2"):
        if f"{t}.{ls}.gamma" in sd:
            p[ls] = {"gamma": sd[f"{t}.{ls}.gamma"]}
    return p


def convert_vit(sd: StateDict, depth: int = 12,
                global_pool: bool = False) -> Tuple[dict, dict]:
    """timm/reference ViT state_dict → params for
    hairci.models.vit.VisionTransformer."""
    d_model = sd["cls_token"].reshape(1, 1, -1).shape[-1]
    params: Dict[str, dict] = {
        "cls_token": sd["cls_token"].reshape(1, 1, -1),
        "pos_embed": sd["pos_embed"],
        # the hairci ViT always owns an iBOT/SimMIM mask token; zero when
        # the torch checkpoint has none
        "mask_token": sd.get("mask_token",
                             np.zeros((1, 1, d_model), np.float32)
                             ).reshape(1, 1, -1),
        "patch_embed": {"proj": {
            "kernel": _conv(sd["patch_embed.proj.weight"]),
            "bias": sd["patch_embed.proj.bias"],
        }},
    }
    for i in range(depth):
        params[f"block{i}"] = _timm_block(sd, f"blocks.{i}")
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


# ---------------------------------------------------------------------------
# torchvision-layout ViT (SimMIM / MSN / ViTWrapper wrap
# `torchvision.models.vit_b_16`; `backbone.py:92,558,614`)
# ---------------------------------------------------------------------------

def convert_torchvision_vit(sd: StateDict, depth: int = 12) -> Tuple[dict, dict]:
    """torchvision VisionTransformer state_dict → hairci VisionTransformer
    params. Accepts both raw torchvision names (`class_token`,
    `encoder.layers.encoder_layer_N.*`, `mlp.{0,3}`) and the older
    `mlp.linear_{1,2}` naming."""
    cls = sd.get("class_token", sd.get("cls_token"))
    d_model = cls.reshape(1, 1, -1).shape[-1]
    params: Dict[str, dict] = {
        "cls_token": cls.reshape(1, 1, -1),
        "pos_embed": sd.get("encoder.pos_embedding",
                            sd.get("pos_embedding")),
        "mask_token": sd.get("mask_token",
                             np.zeros((1, 1, d_model), np.float32)
                             ).reshape(1, 1, -1),
        "patch_embed": {"proj": {
            "kernel": _conv(sd["conv_proj.weight"]),
            "bias": sd["conv_proj.bias"],
        }},
    }
    for i in range(depth):
        t = f"encoder.layers.encoder_layer_{i}"
        fc1 = f"{t}.mlp.0" if f"{t}.mlp.0.weight" in sd else f"{t}.mlp.linear_1"
        fc2 = f"{t}.mlp.3" if f"{t}.mlp.3.weight" in sd else f"{t}.mlp.linear_2"
        params[f"block{i}"] = {
            "norm1": {"scale": sd[f"{t}.ln_1.weight"],
                      "bias": sd[f"{t}.ln_1.bias"]},
            "norm2": {"scale": sd[f"{t}.ln_2.weight"],
                      "bias": sd[f"{t}.ln_2.bias"]},
            "attn": {
                # nn.MultiheadAttention packs [q|k|v] rows like timm's qkv
                "qkv": {"kernel": _linear(
                            sd[f"{t}.self_attention.in_proj_weight"]),
                        "bias": sd[f"{t}.self_attention.in_proj_bias"]},
                "proj": {"kernel": _linear(
                             sd[f"{t}.self_attention.out_proj.weight"]),
                         "bias": sd[f"{t}.self_attention.out_proj.bias"]},
            },
            "mlp": {
                "fc1": {"kernel": _linear(sd[f"{fc1}.weight"]),
                        "bias": sd[f"{fc1}.bias"]},
                "fc2": {"kernel": _linear(sd[f"{fc2}.weight"]),
                        "bias": sd[f"{fc2}.bias"]},
            },
        }
    params["norm"] = {"scale": sd["encoder.ln.weight"],
                      "bias": sd["encoder.ln.bias"]}
    return params, {}


# ---------------------------------------------------------------------------
# lightly MLP heads (flat nn.Sequential `layers.N` indexing)
# ---------------------------------------------------------------------------

def convert_lightly_mlp(sd: StateDict, prefix: str,
                        linears, bns=None,
                        names=None) -> Tuple[dict, dict]:
    """lightly ProjectionHead `layers.N` Sequential → hairci MLPHead params.

    ``linears``: Sequential indices of the Linear layers;
    ``bns``: aligned BatchNorm1d indices (None where absent);
    ``names``: target flax layer names (default dense{i}/bn{i})."""
    bns = bns or [None] * len(linears)
    params: Dict[str, dict] = {}
    stats: Dict[str, dict] = {}
    for i, (lin, bn) in enumerate(zip(linears, bns)):
        name = names[i] if names else f"dense{i}"
        p = {"kernel": _linear(sd[f"{prefix}layers.{lin}.weight"])}
        if f"{prefix}layers.{lin}.bias" in sd:
            p["bias"] = sd[f"{prefix}layers.{lin}.bias"]
        params[name] = p
        if bn is not None and f"{prefix}layers.{bn}.weight" in sd:
            params[f"bn{i}"] = {"scale": sd[f"{prefix}layers.{bn}.weight"],
                                "bias": sd[f"{prefix}layers.{bn}.bias"]}
            stats[f"bn{i}"] = {
                "mean": sd[f"{prefix}layers.{bn}.running_mean"],
                "var": sd[f"{prefix}layers.{bn}.running_var"]}
    return params, stats


def _weight_norm_v(sd: StateDict, prefix: str) -> Array:
    """Direction matrix of a torch weight_norm'd Linear (old `weight_g/v`
    and new `parametrizations.weight.original{0,1}` layouts)."""
    for key in (f"{prefix}.weight_v",
                f"{prefix}.parametrizations.weight.original1",
                f"{prefix}.weight"):
        if key in sd:
            return sd[key]
    raise KeyError(f"no weight-norm weight under {prefix}")


# ---------------------------------------------------------------------------
# per-mode converters (the reference eval CLI's strict per-mode formats,
# `knn_classification.py:124-189`)
# ---------------------------------------------------------------------------

def convert_simclr(sd: StateDict, model: str = "resnet18"
                   ) -> Tuple[dict, dict]:
    """Reference `SimCLR` (`backbone.py:648-681`) → hairci SimCLRModule.

    resnet*: `backbone.{0,1,4-7}` Sequential(children[:-1]);
    vit_b_16: `backbone.{conv_proj,cls_token,encoder.*}` (ViTWrapper)."""
    if model == "vit_b_16":
        bp, bs = convert_torchvision_vit(_sub(sd, "backbone."))
    else:
        backbone_sd = strip_sequential_resnet_prefix(sd, "backbone.")
        stage_sizes = (2, 2, 2, 2) if model == "resnet18" else (3, 4, 6, 3)
        bp, bs = convert_resnet(backbone_sd, stage_sizes,
                                bottleneck=model != "resnet18")
    hp, hs = convert_simclr_projection_head(sd, "projection_head.")
    return ({"backbone": bp, "head": hp},
            {"backbone": bs, "head": hs})


def convert_supcon(sd: StateDict, model: str = "resnet18"
                   ) -> Tuple[dict, dict]:
    """Reference `SupConResNet` (`backbone.py:396-417`) → hairci
    SupConModule: from-scratch CIFAR-style encoder (`shortcut.{0,1}`
    instead of torchvision's `downsample.{0,1}`) + mlp head
    (`head.0`/`head.2`)."""
    enc = {k.replace(".shortcut.", ".downsample."): v
           for k, v in _sub(sd, "encoder.").items()}
    stage_sizes = (2, 2, 2, 2) if model in ("resnet18", "resnet34") else \
        (3, 4, 6, 3)
    bp, bs = convert_resnet(enc, stage_sizes,
                            bottleneck=model not in ("resnet18", "resnet34"))
    params = {"encoder": bp}
    stats = {"encoder": bs}
    if "head.weight" in sd:  # head='linear'
        params["head_fc"] = {"kernel": _linear(sd["head.weight"]),
                             "bias": sd["head.bias"]}
    else:  # head='mlp': Sequential(Linear, ReLU, Linear)
        params["head_fc1"] = {"kernel": _linear(sd["head.0.weight"]),
                              "bias": sd["head.0.bias"]}
        params["head_fc2"] = {"kernel": _linear(sd["head.2.weight"]),
                              "bias": sd["head.2.bias"]}
    return params, stats


def convert_mae(sd: StateDict, depth: int = 12,
                decoder_depth: int = 8) -> Tuple[dict, dict]:
    """Reference `MAE` (`backbone.py:462-525`: lightly
    MaskedVisionTransformerTIMM encoder + MAEDecoderTIMM) → hairci
    MAEModule {encoder, decoder}."""
    ep, _ = convert_vit(_sub(sd, "backbone.vit."), depth=depth)
    dec_p: Dict[str, dict] = {}
    if "decoder.decoder_embed.weight" in sd:
        dsd = _sub(sd, "decoder.")
        dec_p["embed"] = {"kernel": _linear(dsd["decoder_embed.weight"]),
                          "bias": dsd["decoder_embed.bias"]}
        dec_p["mask_token"] = dsd["mask_token"].reshape(1, 1, -1)
        for i in range(decoder_depth):
            dec_p[f"block{i}"] = _timm_block(dsd, f"decoder_blocks.{i}")
        dec_p["norm"] = {"scale": dsd["decoder_norm.weight"],
                         "bias": dsd["decoder_norm.bias"]}
        dec_p["pred"] = {"kernel": _linear(dsd["decoder_pred.weight"]),
                         "bias": dsd["decoder_pred.bias"]}
    params = {"encoder": ep}
    if dec_p:
        params["decoder"] = dec_p
    return params, {}


def convert_simmim(sd: StateDict, depth: int = 12) -> Tuple[dict, dict]:
    """Reference `SimMIM` (`backbone.py:549-601`: torchvision vit_b_16 +
    linear decoder) → hairci SimMIMModule.

    Partial by design: hairci's SimMIM encoder is cls-token-free with fixed
    sincos pos-embeds, so torchvision's `class_token`/`pos_embedding` have
    no target (dropped); blocks/patch-embed/final-LN/decoder transfer."""
    vp, _ = convert_torchvision_vit(_sub(sd, "backbone.vit."), depth=depth)
    params: Dict[str, dict] = {
        "patch_embed": vp["patch_embed"],
        "mask_token": vp["mask_token"],
        "norm": vp["norm"],
        "decoder": {"kernel": _linear(sd["decoder.weight"]),
                    "bias": sd["decoder.bias"]},
    }
    for i in range(depth):
        params[f"blocks_{i}"] = vp[f"block{i}"]
    return params, {}


def convert_msn(sd: StateDict, depth: int = 12
                ) -> Tuple[dict, dict, dict, dict]:
    """Reference `MSN` (`backbone.py:87-121`) → hairci MSNModule.

    Returns (params, stats, ema_params, ema_stats): the trainable branch is
    the reference's `anchor_*`, the EMA target the reference's frozen
    `backbone`/`projection_head` (which its `extract_features` serves)."""
    head_layout = dict(linears=(0, 3, 6), bns=(1, 4, None))

    def branch(bprefix, hprefix):
        bp, _ = convert_torchvision_vit(_sub(sd, bprefix), depth=depth)
        hp, hs = convert_lightly_mlp(sd, hprefix, **head_layout)
        p = {"backbone": bp, "projection_head": hp,
             "prototypes": sd["prototypes"]}
        return p, {"projection_head": hs} if hs else (p, {})

    params, stats = branch("anchor_backbone.vit.", "anchor_projection_head.")
    ema_params, ema_stats = branch("backbone.vit.", "projection_head.")
    return params, stats, ema_params, ema_stats


def convert_densecl(sd: StateDict) -> Tuple[dict, dict, dict, dict]:
    """Reference `DenseCL` (`backbone.py:123-161`: resnet50 children[:-2] +
    global/local DenseCLProjectionHeads + momentum copies) → hairci
    DenseCLModule. Returns (params, stats, ema_params, ema_stats)."""

    def branch(suffix):
        backbone_sd = strip_sequential_resnet_prefix(
            sd, f"backbone{suffix}.")
        bp, bs = convert_resnet(backbone_sd, (3, 4, 6, 3), bottleneck=True)
        gp, _ = convert_lightly_mlp(sd, f"projection_head_global{suffix}.",
                                    linears=(0, 2))
        lp, _ = convert_lightly_mlp(sd, f"projection_head_local{suffix}.",
                                    linears=(0, 2), names=("fc1", "fc2"))
        return ({"backbone": bp, "projection_head_global": gp,
                 "projection_head_local": lp},
                {"backbone": bs})

    params, stats = branch("")
    ema_params, ema_stats = branch("_momentum")
    return params, stats, ema_params, ema_stats


def convert_dinov2(sd: StateDict, depth: int = 12) -> Tuple[dict, dict]:
    """Reference `DINOv2` (`backbone.py:1021-1109`: timm ViT-S student +
    frozen teacher, shared DINO/iBOT projection head) → hairci DINOv2Module.

    Returns (params, ema_params) — student → params (the branch hairci's
    and the reference's `extract_features` use), teacher → ema_params.
    The weight-normalized last layer's direction matrix maps onto
    `prototypes` (hairci re-normalizes rows at apply, i.e. g==1 — the DINO
    `norm_last_layer` convention)."""

    def head(prefix):
        hp, _ = convert_lightly_mlp(sd, prefix, linears=(0, 2, 4),
                                    names=("fc1", "fc2", "fc3"))
        hp["prototypes"] = _weight_norm_v(sd, f"{prefix}last_layer")
        return hp

    def branch(bprefix, hprefix):
        bp, _ = convert_vit(_sub(sd, bprefix), depth=depth)
        return {"backbone": bp, "dino_head": head(hprefix)}

    params = branch("student_backbone.vit.", "student_head.dino_head.")
    ema_params = branch("teacher_backbone.vit.", "teacher_head.dino_head.")
    return params, ema_params


def _siam_decoder_block(sd: StateDict, t: str) -> Tuple[dict, dict]:
    """SiameseIM decoder Block whose norms are either LayerNorm
    (`use_*_ln`) or PermuteBN (`backbone.py:1202-1215,1280-1292`,
    `{t}.normN.bn.*` keys). Returns (params, batch_stats)."""
    params = _timm_block(sd, t) if f"{t}.norm1.weight" in sd else None
    if params is not None:
        return params, {}
    params = {
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
    stats = {}
    for n in ("norm1", "norm2"):
        params[n] = {"BatchNorm_0": {"scale": sd[f"{t}.{n}.bn.weight"],
                                     "bias": sd[f"{t}.{n}.bn.bias"]}}
        stats[n] = {"BatchNorm_0": {
            "mean": sd[f"{t}.{n}.bn.running_mean"],
            "var": sd[f"{t}.{n}.bn.running_var"]}}
    return params, stats


def siameseim_block_norm(sd: StateDict) -> str:
    """Detect the decoder-block norm layout of a SiameseIM checkpoint —
    "ln" for the `use_proj_ln`/`use_pred_ln` variant, "permute_bn" for the
    store_true default (`backbone.py:1280-1292`). The evaluating module
    must be built with the matching `block_norm` or the converted params
    merge into a corrupt tree. Raises on mixed layouts (hairci uses one
    norm for projector and predictor blocks)."""
    kinds = set()
    for k in sd:
        if "decoder_blocks." in k and ".norm1." in k:
            kinds.add("permute_bn" if ".norm1.bn." in k else "ln")
    if len(kinds) > 1:
        raise ValueError(
            "checkpoint mixes LayerNorm and PermuteBN decoder blocks "
            "(use_proj_ln != use_pred_ln); hairci's SiameseIM uses one "
            "block_norm for both — convert manually via "
            "hairci.retrieval.torch_import")
    return kinds.pop() if kinds else "permute_bn"


def convert_siameseim(sd: StateDict, depth: int = 12
                      ) -> Tuple[dict, dict, dict, dict]:
    """Reference `SiameseIMViT` (`backbone.py:1217-1719`) → hairci
    SiameseIMModule: (params, batch_stats, ema_params, ema_batch_stats)
    carrying the online encoder (+ decoder stack when the checkpoint has
    one: `decoder_embed`, `projector_decoder_blocks` (LN or PermuteBN),
    `predictor_decoder_blocks`, `decoder_pred`, `decoder_pos_mlp`,
    `mask_token` — `backbone.py:1268-1303`) and the momentum (`mm_*`)
    copies (`build_momentum_target`, `backbone.py:1318-1372`). Merge the
    returned trees over an initialized state with `merge_params`."""
    # SiameseIM's mask_token is DECODER-width and top-level
    # (`backbone.py:1271`) — hide it from convert_vit, which would map it
    # into the encoder subtree (the MAE layout); decoder_stack places it
    mm = {k[3:]: v for k, v in sd.items() if k.startswith("mm_")}
    mm["pos_embed"] = sd["pos_embed"]  # fixed sincos, shared by both branches
    ep, _ = convert_vit(
        {k: v for k, v in sd.items() if k != "mask_token"}, depth=depth)
    emp, _ = convert_vit(
        {k: v for k, v in mm.items() if k != "mask_token"}, depth=depth)
    params, emap = {"encoder": ep}, {"encoder": emp}
    stats, emastats = {}, {}

    def decoder_stack(src: StateDict, tree: dict, st: dict,
                      online: bool) -> None:
        if "decoder_embed.weight" not in src:
            return
        tree["decoder_embed"] = {
            "kernel": _linear(src["decoder_embed.weight"]),
            "bias": src["decoder_embed.bias"]}
        tree["mask_token"] = src["mask_token"]

        def blocks(torch_prefix, flax_prefix):
            i = 0
            while (f"{torch_prefix}.{i}.attn.qkv.weight") in src:
                p, s = _siam_decoder_block(src, f"{torch_prefix}.{i}")
                tree[f"{flax_prefix}_{i}"] = p
                if s:
                    st[f"{flax_prefix}_{i}"] = s
                i += 1

        blocks("projector_decoder_blocks", "projector_blocks")
        if not online:
            return  # the mm branch stops at the projector (backbone.py:1345-1367)
        blocks("predictor_decoder_blocks", "predictor_blocks")
        for name in ("decoder_pred", "decoder_pos_mlp"):
            if f"{name}.weight" in src:
                tree[name] = {"kernel": _linear(src[f"{name}.weight"]),
                              "bias": src[f"{name}.bias"]}

    decoder_stack(sd, params, stats, online=True)
    decoder_stack(mm, emap, emastats, online=False)
    return params, stats, emap, emastats


def merge_params(base, override):
    """Recursively overlay converted (partial) params onto an init tree."""
    out = dict(base)
    for k, v in override.items():
        if (isinstance(v, Mapping) and k in base
                and isinstance(base[k], Mapping)):
            out[k] = merge_params(base[k], v)
        else:
            out[k] = v
    return out


def convert_vit_face(sd: StateDict, depth: int = 20) -> Tuple[dict, dict]:
    """Reference `ViT_face`/`ViTs_face` (einops-style, `vit_face.py:338-404`
    / `vits_face.py:339-401`) → hairci models.face_vit.ViTFace params.

    Torch layout: `transformer.layers.{i}.{0,1}.fn` = Residual(PreNorm(...))
    with `fn.norm` the pre-LN and `fn.fn` the Attention
    (`to_qkv`/`to_out.0`) or FeedForward (`net.0`/`net.3`); `mlp_head.0` is
    the final LayerNorm; `loss.weight`(/`loss.bias`) the margin head."""
    params: Dict[str, dict] = {
        "cls_token": sd["cls_token"],
        "pos_embedding": sd["pos_embedding"],
        "patch_to_embedding": {
            "kernel": _linear(sd["patch_to_embedding.weight"]),
            "bias": sd["patch_to_embedding.bias"]},
        "mlp_head": {"scale": sd["mlp_head.0.weight"],
                     "bias": sd["mlp_head.0.bias"]},
    }
    for i in range(depth):
        attn = f"transformer.layers.{i}.0.fn"
        ff = f"transformer.layers.{i}.1.fn"
        params[f"_PreNormAttention_{i}"] = {
            "LayerNorm_0": {"scale": sd[f"{attn}.norm.weight"],
                            "bias": sd[f"{attn}.norm.bias"]},
            "Dense_0": {"kernel": _linear(sd[f"{attn}.fn.to_qkv.weight"])},
            "Dense_1": {"kernel": _linear(sd[f"{attn}.fn.to_out.0.weight"]),
                        "bias": sd[f"{attn}.fn.to_out.0.bias"]},
        }
        params[f"_PreNormFF_{i}"] = {
            "LayerNorm_0": {"scale": sd[f"{ff}.norm.weight"],
                            "bias": sd[f"{ff}.norm.bias"]},
            "Dense_0": {"kernel": _linear(sd[f"{ff}.fn.net.0.weight"]),
                        "bias": sd[f"{ff}.fn.net.0.bias"]},
            "Dense_1": {"kernel": _linear(sd[f"{ff}.fn.net.3.weight"]),
                        "bias": sd[f"{ff}.fn.net.3.bias"]},
        }
    if "loss.weight" in sd:
        params["loss_weight"] = sd["loss.weight"]
        if "loss.bias" in sd:
            params["loss_bias"] = sd["loss.bias"]
    return params, {}


# ---------------------------------------------------------------------------
# reverse direction: hairci params → torch state_dicts (export)
# ---------------------------------------------------------------------------

def export_resnet(params: Mapping, stats: Mapping,
                  stage_sizes=(2, 2, 2, 2),
                  bottleneck: bool = False) -> Dict[str, Array]:
    """hairci ResNet (params, batch_stats) → torchvision-layout state_dict
    (exact inverse of `convert_resnet`; roundtrip tested)."""
    sd: Dict[str, Array] = {}

    def put_conv(torch_name, p):
        sd[f"{torch_name}.weight"] = np.transpose(
            np.asarray(p["kernel"]), (3, 2, 0, 1))  # HWIO → OIHW

    def put_bn(torch_name, p, s):
        sd[f"{torch_name}.weight"] = np.asarray(p["scale"])
        sd[f"{torch_name}.bias"] = np.asarray(p["bias"])
        sd[f"{torch_name}.running_mean"] = np.asarray(s["mean"])
        sd[f"{torch_name}.running_var"] = np.asarray(s["var"])

    put_conv("conv1", params["conv_init"])
    put_bn("bn1", params["bn_init"], stats["bn_init"])
    block_cls = "BottleneckBlock" if bottleneck else "BasicBlock"
    n_convs = 3 if bottleneck else 2
    gi = 0
    for stage, n_blocks in enumerate(stage_sizes, start=1):
        for b in range(n_blocks):
            t = f"layer{stage}.{b}"
            bp, bs = params[f"{block_cls}_{gi}"], stats[f"{block_cls}_{gi}"]
            for c in range(n_convs):
                put_conv(f"{t}.conv{c + 1}", bp[f"Conv_{c}"])
                put_bn(f"{t}.bn{c + 1}", bp[f"BatchNorm_{c}"],
                       bs[f"BatchNorm_{c}"])
            if "conv_proj" in bp:
                put_conv(f"{t}.downsample.0", bp["conv_proj"])
                put_bn(f"{t}.downsample.1", bp["norm_proj"],
                       bs["norm_proj"])
            gi += 1
    return sd


def export_vit(params: Mapping, depth: int = 12) -> Dict[str, Array]:
    """hairci VisionTransformer params → timm-layout state_dict (inverse of
    `convert_vit`; the hairci-only mask_token is exported too — timm-side
    loaders can drop it with strict=False)."""
    sd: Dict[str, Array] = {
        "cls_token": np.asarray(params["cls_token"]),
        "pos_embed": np.asarray(params["pos_embed"]),
        "mask_token": np.asarray(params["mask_token"]),
        "patch_embed.proj.weight": np.transpose(
            np.asarray(params["patch_embed"]["proj"]["kernel"]),
            (3, 2, 0, 1)),
        "patch_embed.proj.bias": np.asarray(
            params["patch_embed"]["proj"]["bias"]),
    }
    for i in range(depth):
        bp = params[f"block{i}"]
        t = f"blocks.{i}"
        sd[f"{t}.norm1.weight"] = np.asarray(bp["norm1"]["scale"])
        sd[f"{t}.norm1.bias"] = np.asarray(bp["norm1"]["bias"])
        sd[f"{t}.norm2.weight"] = np.asarray(bp["norm2"]["scale"])
        sd[f"{t}.norm2.bias"] = np.asarray(bp["norm2"]["bias"])
        sd[f"{t}.attn.qkv.weight"] = np.asarray(
            bp["attn"]["qkv"]["kernel"]).T
        sd[f"{t}.attn.qkv.bias"] = np.asarray(bp["attn"]["qkv"]["bias"])
        sd[f"{t}.attn.proj.weight"] = np.asarray(
            bp["attn"]["proj"]["kernel"]).T
        sd[f"{t}.attn.proj.bias"] = np.asarray(bp["attn"]["proj"]["bias"])
        sd[f"{t}.mlp.fc1.weight"] = np.asarray(bp["mlp"]["fc1"]["kernel"]).T
        sd[f"{t}.mlp.fc1.bias"] = np.asarray(bp["mlp"]["fc1"]["bias"])
        sd[f"{t}.mlp.fc2.weight"] = np.asarray(bp["mlp"]["fc2"]["kernel"]).T
        sd[f"{t}.mlp.fc2.bias"] = np.asarray(bp["mlp"]["fc2"]["bias"])
        for src, dst in (("ls1", "ls1"), ("ls2", "ls2")):
            if src in bp:
                sd[f"{t}.{dst}.gamma"] = np.asarray(bp[src]["gamma"])
    for n in ("norm", "fc_norm"):
        if n in params:
            sd[f"{n}.weight"] = np.asarray(params[n]["scale"])
            sd[f"{n}.bias"] = np.asarray(params[n]["bias"])
    return sd


def export_sham2(params: Mapping, stats: Mapping,
                 model: str = "resnet18") -> Dict[str, Array]:
    """hairci SHAMModule → the reference SHAM2 checkpoint layout
    (`nn.Sequential(*children)` backbone + lightly projection head) so
    hairci-trained weights load in the reference's eval tooling."""
    stage_sizes = (2, 2, 2, 2) if model == "resnet18" else (3, 4, 6, 3)
    bsd = export_resnet(params["backbone"], stats["backbone"], stage_sizes,
                        bottleneck=model != "resnet18")
    seq_map = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
               "layer3": "6", "layer4": "7"}
    sd: Dict[str, Array] = {}
    for k, v in bsd.items():
        head, _, tail = k.partition(".")
        sd[f"backbone.{seq_map[head]}.{tail}"] = v
    hp, hs = params["projection_head"], stats["projection_head"]
    for i, (lin, bn) in enumerate((("0", "1"), ("3", "4"))):
        sd[f"projection_head.layers.{lin}.weight"] = np.asarray(
            hp[f"dense{i}"]["kernel"]).T
        if "bias" in hp[f"dense{i}"]:
            sd[f"projection_head.layers.{lin}.bias"] = np.asarray(
                hp[f"dense{i}"]["bias"])
        sd[f"projection_head.layers.{bn}.weight"] = np.asarray(
            hp[f"bn{i}"]["scale"])
        sd[f"projection_head.layers.{bn}.bias"] = np.asarray(
            hp[f"bn{i}"]["bias"])
        sd[f"projection_head.layers.{bn}.running_mean"] = np.asarray(
            hs[f"bn{i}"]["mean"])
        sd[f"projection_head.layers.{bn}.running_var"] = np.asarray(
            hs[f"bn{i}"]["var"])
    return sd


def save_torch_state_dict(sd: Mapping[str, Array], path: str,
                          wrap_key: str = "model_state_dict") -> None:
    """Write an exported state_dict as a torch .pth (reference checkpoint
    shape: {'model_state_dict': ...}, `pretrain_engine.py:792-800`)."""
    import torch

    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
    torch.save({wrap_key: tensors} if wrap_key else tensors, path)
