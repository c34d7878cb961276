"""Typed configuration system (dataclasses + YAML).

Replaces the reference's argparse-plus-two-YAML-families setup
(/root/reference/train.py:471-542, data/hyps/hyp.scratch.s2anet.yaml,
data/dota.yaml) with one structured config. Defaults reproduce the
reference's published 70.2/70.7-mAP50 training recipe (BASELINE.md).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Sequence

import yaml


@dataclass
class ModelConfig:
    backbone: str = "resnet50"
    num_classes: int = 15
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    frozen_stages: int = -1          # detector.py:20 — nothing frozen
    norm_eval: bool = False
    with_orconv: bool = True
    # loss (head.py:94-135)
    fl_gamma: float = 2.0
    fl_alpha: float = 0.5
    smooth_beta: float = 1.0 / 9.0
    odm_balance: float = 1.0
    reg_balance: float = 1.0
    fpn_balance: Sequence[float] = (1.0, 1.0, 1.0, 1.0, 1.0)
    # assignment IoU backend: "auto" = Pallas kernel on TPU, XLA elsewhere
    assign_iou_impl: str = "auto"     # auto | xla | pallas
    # rematerialize backbone activations in the backward (trades FLOPs for
    # HBM when the step sits at the memory cliff; off = let XLA decide)
    backbone_remat: bool = False
    # >0: train-time BatchNorm statistics from the first k images of the
    # batch (models/resnet.py SampledBatchNorm) — cuts the BN-stat HBM
    # pass by batch/k. This is the reference's own statistical regime
    # (torch DDP without SyncBN = per-GPU-batch stats, e.g. 2 images);
    # 0 = exact global-batch stats (the parity default). Gated on the
    # synthetic acceptance run before any preset ships it.
    bn_stats_images: int = 0
    # training BN statistics backend: "auto" (Pallas single-read moment
    # kernels + closed-form backward on TPU — models/bn.py; flax
    # nn.BatchNorm elsewhere) | "xla" | "pallas". Identical math and
    # parameter trees; a pure performance switch for the BN-stat passes.
    bn_impl: str = "auto"
    # AlignConv implementation: "auto" (Pallas hat-matmul kernel on TPU,
    # XLA gather elsewhere), "hat", or "gather" — see ops/pallas/deform_kernel.py
    deform_impl: str = "auto"
    # clamp AlignConv sampling offsets to +-N feature cells (0 = off, exact
    # reference semantics). A trained FAM regresses unconstrained deltas at
    # background positions, whose garbage-sized refined anchors would flip
    # the hat kernel's exactness cond to the gather fallback level-wide;
    # clamping bounds the sampling receptive field (semantically inert at
    # background — no detection is decoded there) and guarantees the fast
    # path. 6.0 keeps every tap inside the kernel's margin-8 window.
    align_offset_clamp: float = 0.0
    # int8 post-training quantization for INFERENCE (ops/quant.py):
    # "none" (float, the parity default) | "int8" (calibrate activation
    # ranges on the first eval batches, then run backbone/FPN/head-stack
    # convs through the int8 MXU — ~2x conv rate on v5e). Training always
    # runs float.
    quant: str = "none"
    quant_calib_batches: int = 4      # batches used to calibrate ranges
    # which module groups quantize under quant="int8" (subset of
    # {backbone, neck, head_stacks, orconv, heads}). Quantizing everything
    # measured SLOWER than float (BENCH.md round-4: the ORConv + prediction
    # heads' quant/dequant epilogues outweigh their int8 MXU gain at
    # 5-level head shapes); the default is the measured throughput argmax.
    # Groups outside the scope run float with an identical parameter tree.
    quant_scope: Sequence[str] = ("backbone", "neck", "head_stacks")
    # serving-time conv+BN weight folding (models/fold.py; reference
    # fuse_conv_and_bn, utils/torch_utils.py:206-230): standalone inference
    # (val.py / predict.py) folds the BN affine+stats into conv kernels at
    # load time — exact up to one f32 reassociation per channel. Training
    # and the trainer's per-epoch val always keep live BN.
    fold_bn: bool = True
    # inference (head.py:73-76)
    score_thr: float = 0.05
    # predict.py's drawing/saving threshold: kept SEPARATE from the eval
    # protocol's score_thr (0.05) so a config that pins the eval protocol
    # (configs/dota_r50.yaml) doesn't silently flood predict outputs with
    # sub-0.3 detections; `predict.py --conf` overrides it
    predict_score_thr: float = 0.3
    nms_iou_thr: float = 0.5
    max_before_nms_per_level: int = 2000
    max_per_img: int = 2000
    pre_nms_cap: int = 4096


DOTA10_CLASSES = (
    "plane", "baseball-diamond", "bridge", "ground-track-field",
    "small-vehicle", "large-vehicle", "ship", "tennis-court",
    "basketball-court", "storage-tank", "soccer-ball-field", "roundabout",
    "harbor", "swimming-pool", "helicopter",
)
# DOTA-v1.5 adds container-crane; v2.0 further adds airport + helipad
# (dota-v1.5_evaluation_task1.py classnames parity)
DOTA15_CLASSES = DOTA10_CLASSES + ("container-crane",)
DOTA20_CLASSES = DOTA15_CLASSES + ("airport", "helipad")
HRSC_CLASSES = ("ship",)

NAMES_PRESETS = {
    "dota": DOTA10_CLASSES, "dota-v1.0": DOTA10_CLASSES,
    "dota-v1.5": DOTA15_CLASSES, "dota-v2.0": DOTA20_CLASSES,
    "hrsc": HRSC_CLASSES, "hrsc2016": HRSC_CLASSES,
}


@dataclass
class DataConfig:
    root: str = ""
    train_list: str = ""              # txt of train image paths (YOLO layout)
    val_list: str = ""
    # class names, or a preset key ("dota", "dota-v1.5", "dota-v2.0", "hrsc")
    names: Sequence[str] = DOTA10_CLASSES
    img_size: int = 1024
    max_gt: int = 512                 # padded gt capacity per image
    cache: str = ""                   # image cache: "" | "ram" | "disk" | "packed"
    # host loader: worker count (0 = auto) and worker kind — "process"
    # scales decode+augment with host cores via forked workers + shared
    # memory; "thread" is the low-footprint default
    workers: int = 0
    loader: str = "thread"            # "thread" | "process"
    # augmentation (hyp.scratch.s2anet.yaml: only fliplr + 90-degree rotation)
    fliplr: float = 0.5
    flipud: float = 0.0
    degrees: float = 180.0            # >0 enables random 90-degree-multiple rotation
    hsv_h: float = 0.0
    hsv_s: float = 0.0
    hsv_v: float = 0.0
    mosaic: float = 0.0
    mixup: float = 0.0
    translate: float = 0.0
    scale: float = 0.0
    # eval ground truth (data/dota.yaml style)
    val_gt_dir: str = ""              # per-image DOTA labelTxt dir for eval
    val_split_gt_dir: str = ""        # split-chip GT for is_mAP_split=True


@dataclass
class TrainConfig:
    epochs: int = 12
    batch_size: int = 8               # global batch
    lr0: float = 0.005
    momentum: float = 0.9
    weight_decay: float = 1e-4
    warmup_iters: int = 500
    warmup_init_factor: float = 1.0 / 3.0
    lr_schedule: str = "step"         # step | cosine | linear
    lr_decay_epochs: Sequence[float] = (8 / 12, 11 / 12)  # general.py:479-501
    lr_decay_factor: float = 0.1
    lrf: float = 0.1                  # final fraction for cosine/linear
    grad_clip_norm: float = 35.0
    ema_decay: float = 0.9999
    ema_ramp_updates: int = 2000
    dtype: str = "bfloat16"           # compute dtype (reference: AMP fp16)
    seed: int = 0
    save_dir: str = "runs/train/exp"
    save_period: int = -1
    val_every_epoch: bool = True
    # ImageNet-pretrained backbone: path to a torchvision ResNet state dict
    # (.pth), or "auto" to search the torch hub cache (backbone.py:241-303)
    pretrained: str = ""
    # nominal global batch for gradient accumulation (train.py:152-155);
    # 0 disables. accumulate = max(round(nominal / batch_size), 1)
    nominal_batch_size: int = 0
    plots: bool = True                # batch mosaics, label stats, PR curves
    # W&B experiment tracking (utils/loggers/wandb/wandb_utils.py:106 parity):
    # empty project = off; logs the same key set as CSV/TB plus the run config
    wandb_project: str = ""
    wandb_entity: str = ""


@dataclass
class EvalConfig:
    batch_size: int = 16
    is_map_split: bool = True         # evaluate against split-chip GT
    conf_thres: float = 0.05
    iou_thres: float = 0.5
    merge_nms_thr: float = 0.5        # cross-chip poly NMS (ResultMerge)
    use_07_metric: bool = True        # 11-point VOC AP
    save_results: bool = False        # dump per-class DOTA-format txt files
    task: int = 1                     # 1 = oriented (Task1), 2 = horizontal
    # rect batching (val.py:219 rect=True pad=0.5): shape-ordered batches
    # letterboxed to per-batch minimal shapes (rounded to rect_stride) —
    # cuts padded compute on non-square datasets (HRSC ~30%)
    rect: bool = False
    rect_stride: int = 32


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def save(self, path):
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)


def prune_overrides(d: dict) -> dict:
    """Drop ``None`` leaves (and then-empty sub-dicts) from an override tree.

    The CLIs default config-mirroring flags to ``None`` and pass their
    overrides through this, so a flag the user did NOT type never stomps a
    value from ``--config`` (argparse defaults would otherwise silently
    override the yaml — e.g. ``--backbone``'s default resnet50 replacing a
    config's resnet18)."""
    out = {}
    for k, v in d.items():
        if isinstance(v, dict):
            v = prune_overrides(v)
            if v:
                out[k] = v
        elif v is not None:
            out[k] = v
    return out


def _merge(dc, overrides: dict):
    kwargs = {}
    for f in dataclasses.fields(dc):
        if f.name in overrides:
            v = overrides[f.name]
            if dataclasses.is_dataclass(getattr(dc, f.name)):
                v = _merge(getattr(dc, f.name), v)
            kwargs[f.name] = v
    return dataclasses.replace(dc, **kwargs)


def load_config(path=None, overrides: Optional[dict] = None) -> Config:
    cfg = Config()
    names_explicit = False
    if path:
        with open(path) as f:
            loaded = yaml.safe_load(f) or {}
        names_explicit |= "names" in (loaded.get("data") or {})
        cfg = _merge(cfg, loaded)
    if overrides:
        names_explicit |= bool((overrides.get("data") or {}).get("names"))
        cfg = _merge(cfg, overrides)
    if isinstance(cfg.data.names, str):  # resolve class-list preset keys
        names = NAMES_PRESETS.get(cfg.data.names.lower())
        if names is None:
            raise ValueError(
                f"unknown names preset {cfg.data.names!r}; "
                f"options: {sorted(NAMES_PRESETS)}"
            )
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, names=names)
        )
    # keep the class list and the model head consistent (mAP averages over
    # len(names) — stale slots silently dilute it): an explicitly chosen
    # class list drives num_classes; otherwise the default list adapts to
    # the requested head size (truncate / synthesize placeholder names)
    if len(cfg.data.names) != cfg.model.num_classes:
        if names_explicit:
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(
                    cfg.model, num_classes=len(cfg.data.names))
            )
        else:
            names = tuple(cfg.data.names)[: cfg.model.num_classes]
            names += tuple(
                f"class{i}" for i in range(len(names), cfg.model.num_classes)
            )
            cfg = dataclasses.replace(
                cfg, data=dataclasses.replace(cfg.data, names=names)
            )
    return cfg
