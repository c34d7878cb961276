"""Import PyTorch weights into the flax model trees.

Two entry points:
  * :func:`convert_torch_resnet` — a torchvision-format ResNet state dict
    (conv1/bn1/layer{1..4}.{b}.../downsample...) -> (params, batch_stats)
    subtrees for :class:`ResNetBackbone`. Used for ImageNet-pretrained
    backbone init (the reference downloads these at model build,
    backbone.py:241-303).
  * :func:`convert_reference_s2anet` — a full reference S2ANet checkpoint
    state dict (train.py:423 ``ckpt["model"]``/``ckpt["ema"]`` or an official
    .pth) -> full detector variables, for output-parity testing and for users
    migrating trained weights.

Tensors may be torch.Tensors or NumPy arrays; torch is only imported lazily.
Conv kernels are transposed OIHW -> HWIO (NHWC model).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from .resnet import ARCH_SETTINGS


def _np(t):
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _conv(t):
    return np.transpose(_np(t), (2, 3, 1, 0)).astype(np.float32)  # OIHW->HWIO


def convert_torch_resnet(state_dict: Dict, arch: str = "resnet50"):
    """torchvision ResNet state dict -> (params, batch_stats) for ResNetBackbone."""
    sd = {k: v for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}

    def put_bn(dst_p, dst_s, prefix):
        dst_p["scale"] = _np(sd[prefix + ".weight"]).astype(np.float32)
        dst_p["bias"] = _np(sd[prefix + ".bias"]).astype(np.float32)
        dst_s["mean"] = _np(sd[prefix + ".running_mean"]).astype(np.float32)
        dst_s["var"] = _np(sd[prefix + ".running_var"]).astype(np.float32)

    params["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    params["bn1"], stats["bn1"] = {}, {}
    put_bn(params["bn1"], stats["bn1"], "bn1")

    kind, layer_cfg = ARCH_SETTINGS[arch]
    n_convs = 2 if kind == "basic" else 3
    for stage, n_blocks in enumerate(layer_cfg, start=1):
        for b in range(n_blocks):
            src = f"layer{stage}.{b}"
            dst = f"layer{stage}_{b}"
            blk_p: Dict = {}
            blk_s: Dict = {}
            for c in range(1, n_convs + 1):
                blk_p[f"conv{c}"] = {"kernel": _conv(sd[f"{src}.conv{c}.weight"])}
                blk_p[f"bn{c}"], blk_s[f"bn{c}"] = {}, {}
                put_bn(blk_p[f"bn{c}"], blk_s[f"bn{c}"], f"{src}.bn{c}")
            if f"{src}.downsample.0.weight" in sd:
                blk_p["downsample_conv"] = {
                    "kernel": _conv(sd[f"{src}.downsample.0.weight"])
                }
                blk_p["downsample_bn"], blk_s["downsample_bn"] = {}, {}
                put_bn(blk_p["downsample_bn"], blk_s["downsample_bn"],
                       f"{src}.downsample.1")
            params[dst] = blk_p
            stats[dst] = blk_s
    return params, stats


def load_pretrained_backbone(spec: str, arch: str = "resnet50"):
    """Resolve a ``--pretrained`` spec to ``(params, batch_stats)``.

    ``spec`` is a path to a torchvision ResNet state dict (.pth / .pt), or
    ``"auto"`` to search the local torch hub cache — the same weights the
    reference downloads at model build (backbone.py:241-303). Raises
    FileNotFoundError when nothing matches (no silent fall-through to random
    init: the 70.2-mAP recipe depends on these weights).
    """
    from pathlib import Path

    path = spec
    if spec == "auto":
        cache = Path.home() / ".cache" / "torch" / "hub" / "checkpoints"
        cands = sorted(cache.glob(f"{arch}*.pth")) if cache.is_dir() else []
        if not cands:
            raise FileNotFoundError(
                f"--pretrained auto: no {arch}*.pth in {cache}; pass an "
                "explicit path to a torchvision state dict"
            )
        path = cands[-1]
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_torch_resnet(sd, arch)


def _convert_head(sd: Dict, prefix: str = "head.") -> Dict:
    """Reference S2ANetHead state dict -> flax head params subtree."""
    p: Dict = {}

    def stack(dst_name, src_name, n=2):
        mod = {}
        for i in range(n):
            mod[f"conv{i}"] = {
                "kernel": _conv(sd[f"{prefix}{src_name}.{i}.0.weight"]),
                "bias": _np(sd[f"{prefix}{src_name}.{i}.0.bias"]).astype(np.float32),
            }
        p[dst_name] = mod

    def conv(dst_name, src_name):
        p[dst_name] = {
            "kernel": _conv(sd[f"{prefix}{src_name}.weight"]),
            "bias": _np(sd[f"{prefix}{src_name}.bias"]).astype(np.float32),
        }

    stack("fam_reg_ls", "fam_reg_ls")
    stack("fam_cls_ls", "fam_cls_ls")
    conv("fam_reg_head", "fam_reg_head")
    conv("fam_cls_head", "fam_cls_head")
    p["align_weight"] = _conv(sd[f"{prefix}align_conv.deform_conv.weight"])
    if f"{prefix}or_conv.weight" in sd:
        w = _np(sd[f"{prefix}or_conv.weight"]).astype(np.float32)
        if w.ndim == 5:  # ORConv2d [Cout, Cin, nOrient, kh, kw] — keep layout
            p["or_weight"] = w
        else:  # plain conv fallback (with_orconv=False)
            p["or_conv"] = {"kernel": _conv(w)}
        if f"{prefix}or_conv.bias" in sd:
            p["or_bias"] = _np(sd[f"{prefix}or_conv.bias"]).astype(np.float32)
    stack("odm_reg_ls", "odm_reg_ls")
    stack("odm_cls_ls", "odm_cls_ls")
    conv("odm_reg_head", "odm_reg_head")
    conv("odm_cls_head", "odm_cls_head")
    return p


def convert_reference_s2anet(state_dict: Dict, arch: str = "resnet50"):
    """Full reference S2ANet state dict -> flax ``{"params", "batch_stats"}``.

    Reference key layout (models/detector.py + backbone.py:306-312):
      backbone.backbone.0.{0,1}     = conv1 / bn1
      backbone.backbone.1.1.{b}.*   = layer1 (Sequential(maxpool, layer1))
      backbone.backbone.{2,3,4}.{b}.* = layer2..4
      neck.lateral_convs.{i} / neck.fpn_convs.{i}
      head.* (see _convert_head)
    """
    sd = dict(state_dict)
    # Re-key the backbone part into torchvision format, then reuse the converter.
    bb: Dict = {}
    remap = {
        "backbone.backbone.0.0": "conv1",
        "backbone.backbone.0.1": "bn1",
    }
    for k, v in sd.items():
        if k.startswith("backbone.backbone.0.0."):
            bb["conv1." + k[len("backbone.backbone.0.0."):]] = v
        elif k.startswith("backbone.backbone.0.1."):
            bb["bn1." + k[len("backbone.backbone.0.1."):]] = v
        elif k.startswith("backbone.backbone.1.1."):
            bb["layer1." + k[len("backbone.backbone.1.1."):]] = v
        else:
            m = re.match(r"backbone\.backbone\.([234])\.(.+)", k)
            if m:
                bb[f"layer{m.group(1)}." + m.group(2)] = v
    bb_params, bb_stats = convert_torch_resnet(bb, arch)

    neck: Dict = {}
    i = 0
    while f"neck.lateral_convs.{i}.weight" in sd:
        neck[f"lateral_{i}"] = {
            "kernel": _conv(sd[f"neck.lateral_convs.{i}.weight"]),
            "bias": _np(sd[f"neck.lateral_convs.{i}.bias"]).astype(np.float32),
        }
        i += 1
    i = 0
    while f"neck.fpn_convs.{i}.weight" in sd:
        neck[f"fpn_{i}"] = {
            "kernel": _conv(sd[f"neck.fpn_convs.{i}.weight"]),
            "bias": _np(sd[f"neck.fpn_convs.{i}.bias"]).astype(np.float32),
        }
        i += 1

    head = _convert_head(sd)

    return {
        "params": {"backbone": bb_params, "neck": neck, "head": head},
        "batch_stats": {"backbone": bb_stats},
    }
