"""The S2ANet detector: backbone -> FPN -> S2ANet head (flax, NHWC).

Parity: /root/reference/models/detector.py:9-38. Strides (8, 16, 32, 64, 128);
R-50 backbone with nothing frozen by default (detector.py:20); FPN P3-P7.

Unlike the reference's monolithic ``forward(imgs, targets, post_process)``,
the apply function returns raw head outputs; loss and decoding are pure
functions (`compute_s2anet_loss`, `s2anet_get_bboxes`) composed by the train
and eval steps — this keeps a single traced forward usable for training,
evaluation and serving.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn

from .fpn import FPN
from .head import S2ANetHead
from .resnet import ResNetBackbone, stage_channels


class S2ANet(nn.Module):
    backbone_name: str = "resnet50"
    num_classes: int = 15
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    frozen_stages: int = -1
    norm_eval: bool = False
    with_orconv: bool = True
    backbone_remat: bool = False
    deform_impl: str = "auto"
    align_offset_clamp: float = 0.0
    # mesh for shard_map'ing the hat AlignConv on >1-device meshes (set by
    # parallel.step; GSPMD cannot partition a Pallas custom call itself)
    deform_mesh: Optional[Any] = None
    # height-sharded (spatial) inputs over deform_mesh: the hat AlignConv
    # runs under a halo-exchange shard_map (models/head.py:_spatial_hat)
    deform_spatial: bool = False
    # int8 PTQ inference: "none" (float, the parity default) | "calib"
    # (float forward that records activation ranges into the mutable
    # "quant" collection) | "int8" (static PTQ — needs the calibrated
    # "quant" collection among the apply variables). See ops/quant.py.
    quant: str = "none"
    # which module groups quantize when quant != "none" (subset of
    # ops/quant.py QUANT_SCOPE_ALL: backbone, neck, head_stacks, orconv,
    # heads). Default = the measured throughput argmax (BENCH.md round-4/5
    # scope A/B); groups outside the scope run float with an unchanged
    # parameter tree, so the scope is a pure serving knob.
    quant_scope: Sequence[str] = ("backbone", "neck", "head_stacks")
    # serving-time conv+BN weight folding (models/fold.py): apply only with
    # variables from fold_bn_variables(); inference only
    fold_bn: bool = False
    # >0: train-time BN stats from the first k batch images (models/resnet.py
    # SampledBatchNorm — the reference's per-GPU small-batch regime)
    bn_stats_images: int = 0
    # training BN statistics backend: "auto" = Pallas moment kernels on TPU
    # (models/bn.py — single-read stat reductions + closed-form backward),
    # flax nn.BatchNorm elsewhere; "xla" | "pallas" force one
    bn_impl: str = "auto"
    # mesh for cross-shard (global-batch) BN stats on >1-device meshes
    # (set by parallel.step, like deform_mesh)
    bn_mesh: Optional[Any] = None

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        """imgs: ``[B, H, W, 3]`` float (already /255 normalized)."""
        from ..ops.quant import scope_has

        def scoped(group):
            return self.quant if scope_has(self.quant_scope, group) else "none"

        feats = ResNetBackbone(
            arch=self.backbone_name,
            frozen_stages=self.frozen_stages,
            norm_eval=self.norm_eval,
            remat=self.backbone_remat and train,
            quant=scoped("backbone"),
            fold_bn=self.fold_bn,
            bn_stats_images=self.bn_stats_images,
            bn_impl=self.bn_impl,
            bn_mesh=self.bn_mesh,
            name="backbone",
        )(imgs, train=train)
        pyramid = FPN(
            in_channels=tuple(stage_channels(self.backbone_name)),
            out_channels=256,
            num_outs=len(self.strides),
            quant=scoped("neck"),
            name="neck",
        )(feats)
        return S2ANetHead(
            num_classes=self.num_classes,
            featmap_strides=tuple(self.strides),
            with_orconv=self.with_orconv,
            deform_impl=self.deform_impl,
            align_offset_clamp=self.align_offset_clamp,
            deform_mesh=self.deform_mesh,
            deform_spatial=self.deform_spatial,
            quant=self.quant,
            quant_scope=tuple(self.quant_scope),
            name="head",
        )(pyramid, train=train)
