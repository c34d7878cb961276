"""Load the reference (/root/reference) torch modules on CPU for parity tests.

The reference's training math is pure torch, but its package imports compiled
CUDA extensions at module-import time and downloads torchvision weights at
model build. This shim makes the whole model runnable on CPU by

  * stubbing `torchvision` / `pkg_resources` (imported but unused at runtime),
  * registering torch-CPU implementations for the CUDA extension modules
    (`box_iou_rotated_cuda`, `ml_nms_rotated_cuda`, `nms_rotated_cuda`,
    `orn_cuda`), written against the kernels' documented semantics
    (reference: utils/box_iou_rotated/src/box_iou_rotated_utils.h,
    models/orn/src/cpu/ActiveRotatingFilter_cpu.cpp:20-46,
    utils/ml_nms_rotated/src/nms_rotated_cuda.cu:85-125),
  * patching `models.dcn.deform_conv.deform_conv` with a pure-torch
    bilinear-gather deformable convolution (deform_conv_cuda_kernel.cu:83-232),
  * patching `models.backbone.load_checkpoint` to return a locally generated
    random state dict instead of a model-zoo download.

The rotated-IoU shim is backed by this repo's double-precision polygon
clipping oracle (s2anet_tpu/ops/polyiou_ref.py), which is an *independent*
implementation of the geometry — so parity tests compare the reference's
*assignment / NMS / loss logic* on IoU values both sides agree on.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch

REFERENCE_ROOT = "/root/reference"

_loaded: dict = {}


# --------------------------------------------------------------------------
# torch-CPU implementations of the reference's CUDA extension entry points
# --------------------------------------------------------------------------

def _box_iou_rotated_torch(boxes1, boxes2):
    """utils/box_iou_rotated: exact pairwise rotated IoU [N, M]."""
    from s2anet_tpu.ops.polyiou_ref import box_iou_rotated_np

    b1 = boxes1.detach().cpu().double().numpy()
    b2 = boxes2.detach().cpu().double().numpy()
    iou = box_iou_rotated_np(b1, b2)
    return torch.from_numpy(iou.astype(np.float32))


def _pairwise_iou_np(boxes):
    from s2anet_tpu.ops.polyiou_ref import box_iou_rotated_np

    b = boxes.detach().cpu().double().numpy()
    return box_iou_rotated_np(b, b)


def _greedy_nms(iou, scores, iou_thr):
    """Descending-score greedy sweep; suppress on iou > thr (strict)."""
    order = np.argsort(-scores, kind="stable")
    alive = np.ones(len(scores), dtype=bool)
    keep = []
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        alive &= ~(iou[i] > iou_thr)
        alive[i] = False
    return torch.as_tensor(keep, dtype=torch.long)


def _ml_nms_rotated_torch(dets, scores, labels, iou_threshold):
    """utils/ml_nms_rotated: multi-label NMS, IoU zeroed across classes."""
    if dets.numel() == 0:
        return torch.zeros(0, dtype=torch.long)
    iou = _pairwise_iou_np(dets[:, :5])
    lab = labels.detach().cpu().numpy()
    iou = np.where(lab[:, None] == lab[None, :], iou, 0.0)
    return _greedy_nms(iou, scores.detach().cpu().numpy(), float(iou_threshold))


def _nms_rotated_torch(dets, scores, iou_threshold):
    """utils/nms_rotated: single-class rotated NMS."""
    if dets.numel() == 0:
        return torch.zeros(0, dtype=torch.long)
    iou = _pairwise_iou_np(dets[:, :5])
    return _greedy_nms(iou, scores.detach().cpu().numpy(), float(iou_threshold))


def _arf_forward_torch(weight, indices):
    """models/orn arf_forward: scatter nRotation rotated filter copies.

    weight  [Cout, Cin, nOrient, kH, kW]
    indices [nOrient, kH, kW, nRotation]  (1-based entries)
    output  [Cout * nRotation, Cin * nOrient, kH, kW]
    Semantics: ActiveRotatingFilter_cpu.cpp:20-46.
    """
    cout, cin, n_or, kh, kw = weight.shape
    n_entry = n_or * kh * kw
    n_rot = indices.shape[-1]
    w = weight.reshape(cout, cin, n_entry)
    idx = indices.reshape(n_entry, n_rot).long() - 1
    out = weight.new_zeros(cout, n_rot, cin, n_entry)
    for k in range(n_rot):
        tgt = idx[:, k].view(1, 1, n_entry).expand(cout, cin, n_entry)
        out[:, k].scatter_(2, tgt, w)
    return out.reshape(cout * n_rot, cin * n_or, kh, kw)


def _arf_backward_torch(indices, grad_output):
    """Adjoint of the scatter: gather-and-it's-a-permutation-sum."""
    n_or, kh, kw, n_rot = indices.shape
    n_entry = n_or * kh * kw
    cout_rot, cin_or, _, _ = grad_output.shape
    cout = cout_rot // n_rot
    cin = cin_or // n_or
    g = grad_output.reshape(cout, n_rot, cin, n_entry)
    idx = indices.reshape(n_entry, n_rot).long() - 1
    grad_w = grad_output.new_zeros(cout, cin, n_entry)
    for k in range(n_rot):
        src = idx[:, k].view(1, 1, n_entry).expand(cout, cin, n_entry)
        grad_w += torch.gather(g[:, k], 2, src)
    return grad_w.reshape(cout, cin, n_or, kh, kw)


def _bilinear_torch(x, py, px):
    """Sample NCHW `x` at float coords (py, px) [B, H', W']; zeros outside."""
    b, c, h, w = x.shape
    y0 = torch.floor(py)
    x0 = torch.floor(px)
    wy = py - y0
    wx = px - x0
    out = x.new_zeros(b, c, py.shape[1], py.shape[2])
    bidx = torch.arange(b).view(b, 1, 1)
    for dy in (0, 1):
        for dx in (0, 1):
            yy = (y0 + dy).long()
            xx = (x0 + dx).long()
            wgt = (wy if dy else 1 - wy) * (wx if dx else 1 - wx)
            inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            yyc = yy.clamp(0, h - 1)
            xxc = xx.clamp(0, w - 1)
            v = x[bidx, :, yyc, xxc]  # [B, H', W', C]
            out += (v * (wgt * inb)[..., None]).permute(0, 3, 1, 2)
    return out


def _deform_conv_torch(x, offset, weight, stride=1, padding=0, dilation=1,
                       groups=1, deformable_groups=1, im2col_step=64):
    """Pure-torch DCNv1 forward (deform_conv_cuda_kernel.cu:83-232 semantics).

    Covers the configuration AlignConv uses (groups=1, deformable_groups=1);
    offset channel layout is [2 * kH * kW, H, W] with (dy, dx) pairs per tap.
    """
    if isinstance(stride, tuple):
        stride = stride[0]
    if isinstance(padding, tuple):
        padding = padding[0]
    if isinstance(dilation, tuple):
        dilation = dilation[0]
    assert groups == 1 and deformable_groups == 1
    b, cin, h, w = x.shape
    cout, _, kh, kw = weight.shape
    ho = (h + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    wo = (w + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
    ys = torch.arange(ho, dtype=x.dtype) * stride - padding
    xs = torch.arange(wo, dtype=x.dtype) * stride - padding
    off = offset.reshape(b, kh * kw, 2, ho, wo)
    cols = []
    for t in range(kh * kw):
        i, j = divmod(t, kw)
        py = ys.view(1, ho, 1) + i * dilation + off[:, t, 0]
        px = xs.view(1, 1, wo) + j * dilation + off[:, t, 1]
        cols.append(_bilinear_torch(x, py, px))
    cols = torch.stack(cols, dim=2)  # [B, Cin, kk, Ho, Wo]
    return torch.einsum("bckhw,ock->bohw", cols,
                        weight.reshape(cout, cin, kh * kw))


# --------------------------------------------------------------------------
# loader
# --------------------------------------------------------------------------

def _stub_module(name, **attrs):
    mod = types.ModuleType(name.rsplit(".", 1)[-1])
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def load_reference():
    """Import the reference packages (cached); returns a namespace object."""
    if _loaded:
        return _loaded["ns"]

    if "torchvision" not in sys.modules:
        _stub_module("torchvision")
    if "pkg_resources" not in sys.modules:
        _stub_module("pkg_resources",
                     parse_version=lambda v: tuple(v.split(".")))

    _stub_module("utils.box_iou_rotated.box_iou_rotated_cuda",
                 box_iou_rotated=_box_iou_rotated_torch)
    _stub_module("utils.ml_nms_rotated.ml_nms_rotated_cuda",
                 ml_nms_rotated=_ml_nms_rotated_torch)
    _stub_module("utils.nms_rotated.nms_rotated_cuda",
                 nms_rotated=_nms_rotated_torch)
    _stub_module("models.orn.orn_cuda",
                 arf_forward=_arf_forward_torch,
                 arf_backward=_arf_backward_torch)
    _stub_module("models.dcn.deform_conv_cuda")
    _stub_module("models.dcn.deform_pool_cuda")

    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)

    import utils.general as ref_general
    import utils.metrics as ref_metrics
    import utils.loss as ref_loss
    import utils.bbox_nms_rotated as ref_bbox_nms
    import models.boxes as ref_boxes
    import models.anchors as ref_anchors
    import models.utils as ref_model_utils
    import models.backbone as ref_backbone
    import models.neck as ref_neck
    import importlib

    # `import models.dcn.deform_conv as x` would bind the package ATTRIBUTE
    # `deform_conv` (the Function.apply re-export), not the submodule.
    ref_deform_conv = importlib.import_module("models.dcn.deform_conv")
    import models.alignconv as ref_alignconv
    import models.head as ref_head

    # deform_conv CUDA Function -> pure-torch forward (inference parity only)
    ref_deform_conv.deform_conv = _deform_conv_torch

    # no model-zoo downloads: pretrained init = a locally seeded state dict
    def _local_checkpoint(name):
        torch.manual_seed(0)
        return ref_backbone.ResNet(name).state_dict()

    ref_backbone.load_checkpoint = _local_checkpoint

    import models.detector as ref_detector
    import utils.augmentations as ref_augmentations
    import utils.datasets_rotation as ref_datasets

    ns = types.SimpleNamespace(
        augmentations=ref_augmentations,
        datasets=ref_datasets,
        general=ref_general,
        metrics=ref_metrics,
        loss=ref_loss,
        bbox_nms=ref_bbox_nms,
        boxes=ref_boxes,
        anchors=ref_anchors,
        model_utils=ref_model_utils,
        backbone=ref_backbone,
        neck=ref_neck,
        deform_conv=ref_deform_conv,
        alignconv=ref_alignconv,
        head=ref_head,
        detector=ref_detector,
    )
    _loaded["ns"] = ns
    return ns
