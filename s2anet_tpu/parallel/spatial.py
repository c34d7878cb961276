"""Spatially-sharded whole-image inference over a device mesh.

The reference can only process large aerial images by chipping them into
1024^2 windows on the host and merging detections afterwards
(DOTA_devkit/ImgSplit_multi_process.py + ResultMerge_multi_process.py). On
TPU the same scale-out happens inside the compiler: shard the image's HEIGHT
axis across the mesh and jit the full detector — XLA's SPMD partitioner
inserts halo exchanges for every convolution and the collectives for the
global decode/NMS automatically. One 4096^2 image then runs across 8 chips
with no host-side splitting, no seam handling, and no cross-chip merge NMS
(detections near shard boundaries are handled exactly, not approximately).

This module provides the jitted builder plus a tiny helper to pick a mesh.
It reuses the 1-D mesh ("data" axis) — for inference on a single large
image the data axis IS the spatial axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.head import s2anet_get_bboxes
from .mesh import make_mesh


def make_spatial_eval_step(
    model,
    mesh=None,
    model_cfg=None,
    compute_dtype=jnp.bfloat16,
    max_per_img: Optional[int] = None,
):
    """Build ``step(variables, imgs) -> (det_boxes, det_labels, det_valid)``
    with ``imgs [B, H, W, 3]`` sharded along H across the mesh.

    H must be divisible by the mesh size times the max stride (128) so every
    shard sees whole stride-128 cells; the helper asserts this at trace time.
    """
    mesh = mesh or make_mesh()
    if mesh.devices.size > 1 and getattr(model, "deform_impl", None) != "gather":
        # the hat-matmul AlignConv is a Pallas custom call — GSPMD cannot
        # spatially partition it and would all-gather the sharded activations
        # around it, defeating the height sharding. With a bounded sampling
        # reach (align_offset_clamp, the flagship preset) the head instead
        # runs it under a height-axis shard_map with a clamp+2-row halo
        # exchange (models/head.py:_spatial_hat) — the 4-5x hat win survives
        # spatial mode. Unclamped offsets have unbounded reach, so only then
        # does spatial inference pin the XLA gather path (which GSPMD
        # partitions cleanly with its own halo exchanges).
        import os

        from ..ops.pallas.deform_kernel import MARGIN, hat_kernel_supported

        clamp = float(getattr(model, "align_offset_clamp", 0.0))
        # honor the S2A_DEFORM_IMPL experiment override exactly as the
        # "auto" path in head.py does — a gather-vs-hat A/B in spatial mode
        # must not silently measure hat twice
        env_impl = os.environ.get("S2A_DEFORM_IMPL", "")
        impl = getattr(model, "deform_impl", "auto")
        if impl == "auto" and env_impl:
            impl = env_impl
        if impl != "gather" and 0.0 < clamp <= MARGIN - 2 and (
                impl == "hat" or hat_kernel_supported()):
            model = model.clone(deform_impl="hat", deform_mesh=mesh,
                                deform_spatial=True)
        else:
            model = model.clone(deform_impl="gather")
    post_kwargs = {}
    if model_cfg is not None:
        post_kwargs = dict(
            score_thr=model_cfg.score_thr,
            iou_thr=model_cfg.nms_iou_thr,
            max_before_nms_per_level=model_cfg.max_before_nms_per_level,
            max_per_img=max_per_img or model_cfg.max_per_img,
            pre_nms_cap=model_cfg.pre_nms_cap,
        )
    elif max_per_img:
        post_kwargs = dict(max_per_img=max_per_img)

    img_sharding = NamedSharding(mesh, P(None, "data", None, None))
    rep = NamedSharding(mesh, P())

    def step(variables, imgs):
        n = mesh.devices.size
        assert imgs.shape[1] % (n * 128) == 0, (
            f"H={imgs.shape[1]} must divide mesh*max_stride={n * 128}"
        )
        out = model.apply(variables, imgs.astype(compute_dtype), train=False)
        return s2anet_get_bboxes(out, **post_kwargs)

    return jax.jit(
        step,
        in_shardings=(rep, img_sharding),
        out_shardings=(rep, rep, rep),
    ), mesh


def shard_image(mesh, imgs):
    """Place a host image batch onto the mesh, sharded along height."""
    return jax.device_put(
        imgs, NamedSharding(mesh, P(None, "data", None, None))
    )
