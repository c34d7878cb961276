"""Max-IoU label assignment for rotated anchors — masked, fully vectorized.

The reference assigner (/root/reference/models/utils.py:33-147) loops over
images and gt boxes in Python with dynamic boolean indexing. Here the whole
thing is a fixed-shape tensor program (vmap-able over the batch, jit-safe):
padded gt slots are carried through with a mask and can never be assigned.

Semantics preserved exactly:
  * pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou_thr=0 (strict >),
    gt_max_assign_all=True (every anchor tying a gt's best IoU becomes
    positive; later gts overwrite earlier ones on conflict).
  * anchors whose center leaves the image or whose w/h exceed it are
    "invalid" -> ignore (models/utils.py:69-74).
  * IoUs outside [0, 1] are treated as broken and forced to -0.5 -> ignore
    (models/utils.py:89-98 — the reference clamps a CUDA precision bug; we
    keep the clamp for parity since training behavior depends on it).
  * result codes: >=0 gt index, -1 negative, -2 ignore.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.iou_rotated import box_iou_rotated


@functools.partial(
    jax.jit,
    static_argnames=(
        "imgs_size",
        "pos_iou_thr",
        "neg_iou_thr",
        "min_pos_iou_thr",
        "filter_invalid_anchors",
        "filter_invalid_ious",
        "block_n",
        "gt_tier",
        "iou_impl",
    ),
)
def assign_labels(
    anchors,
    gt_boxes,
    gt_mask,
    imgs_size=(1024, 1024),
    pos_iou_thr: float = 0.5,
    neg_iou_thr: float = 0.4,
    min_pos_iou_thr: float = 0.0,
    filter_invalid_anchors: bool = True,
    filter_invalid_ious: bool = True,
    block_n: int = 2048,
    gt_tier: int = 64,
    iou_impl: str = "xla",
):
    """Assign each anchor a gt index / negative / ignore code.

    Args:
      anchors:  ``[A, 5]`` rotated anchors (pixels/radians).
      gt_boxes: ``[G, 5]`` padded gt rotated boxes.
      gt_mask:  ``[G]`` bool — True for real gt rows.
      imgs_size: (h, w) for the anchor-validity test.
      gt_tier: adaptive-cost dispatch — padded gt rows are a suffix, so when
        at most ``gt_tier`` rows are real, assigning against the first
        ``gt_tier`` slots is exact and skips most of the [A, G] IoU work
        (typical DOTA chips carry well under 64 instances). 0 disables.
      iou_impl: "xla" (default, portable) or "pallas" — the TPU tile kernel
        with bounding-circle tile-skip (ops/pallas/iou_kernel.py), ~2.8x
        faster on the grid-ordered assignment workload. Numerics identical.

    Returns:
      ``assign [A] int32`` (gt index, -1 negative, -2 ignore) and
      ``max_iou [A] float32`` (max IoU over real gts, for diagnostics).
    """
    g = gt_boxes.shape[0]
    if 0 < gt_tier < g:
        kwargs = dict(
            imgs_size=imgs_size, pos_iou_thr=pos_iou_thr,
            neg_iou_thr=neg_iou_thr, min_pos_iou_thr=min_pos_iou_thr,
            filter_invalid_anchors=filter_invalid_anchors,
            filter_invalid_ious=filter_invalid_ious, block_n=block_n,
            gt_tier=0, iou_impl=iou_impl,
        )
        return jax.lax.cond(
            gt_mask.sum() <= gt_tier,
            lambda _: assign_labels(
                anchors, gt_boxes[:gt_tier], gt_mask[:gt_tier], **kwargs
            ),
            lambda _: assign_labels(anchors, gt_boxes, gt_mask, **kwargs),
            operand=None,
        )

    a = anchors.shape[0]
    img_h, img_w = imgs_size

    if filter_invalid_anchors:
        valid = (
            (anchors[:, 0] >= 0)
            & (anchors[:, 1] >= 0)
            & (anchors[:, 0] <= img_w)
            & (anchors[:, 1] <= img_h)
            & (anchors[:, 2] < img_w)
            & (anchors[:, 3] < img_h)
        )
    else:
        valid = jnp.ones((a,), bool)

    if iou_impl == "pallas":
        from ..ops.pallas.iou_kernel import box_iou_rotated_pallas

        iou = box_iou_rotated_pallas(anchors, gt_boxes)  # [A, G]
    else:
        iou = box_iou_rotated(anchors, gt_boxes, block_n=block_n)  # [A, G]
    return assign_from_iou(
        iou,
        valid,
        gt_mask,
        pos_iou_thr=pos_iou_thr,
        neg_iou_thr=neg_iou_thr,
        min_pos_iou_thr=min_pos_iou_thr,
        filter_invalid_ious=filter_invalid_ious,
    )


def assign_from_iou(
    iou,
    valid,
    gt_mask,
    pos_iou_thr: float = 0.5,
    neg_iou_thr: float = 0.4,
    min_pos_iou_thr: float = 0.0,
    filter_invalid_ious: bool = True,
):
    """Assignment rules given a precomputed raw IoU matrix.

    Args:
      iou:     ``[A, G]`` rotated IoU of every anchor against every gt slot.
      valid:   ``[A]`` bool — anchors inside the image (invalid -> ignore).
      gt_mask: ``[G]`` bool — real (non-padded) gt rows.

    Semantics mirror /root/reference/models/utils.py:33-147 exactly (see the
    module docstring); split out so the IoU producer is pluggable (XLA vs
    Pallas kernel) and so parity tests can feed both this and the reference
    assigner the identical IoU matrix.
    """
    a = iou.shape[0]

    if filter_invalid_ious:
        iou = jnp.where((iou < 0) | (iou > 1), -0.5, iou)
    iou = jnp.where(valid[:, None], iou, -0.5)
    # padded gt columns must never win an argmax nor count as negatives' 0-iou
    iou = jnp.where(gt_mask[None, :], iou, -2.0)

    max_iou = iou.max(axis=1)
    argmax = iou.argmax(axis=1).astype(jnp.int32)

    assign = jnp.full((a,), -2, jnp.int32)
    assign = jnp.where((max_iou >= 0) & (max_iou < neg_iou_thr), -1, assign)
    assign = jnp.where(max_iou >= pos_iou_thr, argmax, assign)

    # gt-side fallback: each gt claims every anchor achieving its best IoU
    # (> min_pos_iou_thr). Reference iterates gts in order with overwrite
    # (models/utils.py:132-144) -> ties across gts resolve to the LAST gt.
    # Ties are matched with a 1e-6 tolerance: mathematically-equal IoUs can
    # differ by an ulp in fp32 (the reference's exact-equality test has the
    # same sensitivity in its fp32 CUDA kernel; its author left a commented
    # tolerance variant at models/utils.py:139).
    gt_best = iou.max(axis=0)  # [G]
    claims = (
        gt_mask[None, :]
        & (iou >= gt_best[None, :] - 1e-6)
        & (gt_best[None, :] > min_pos_iou_thr)
    )
    g = iou.shape[1]
    gt_ids = jnp.arange(g, dtype=jnp.int32)
    fb = jnp.where(claims, gt_ids[None, :], -1).max(axis=1)  # last claiming gt
    assign = jnp.where(fb >= 0, fb, assign)

    # no real gt at all: every valid anchor is negative (models/utils.py:77-85)
    none_gt = ~gt_mask.any()
    assign = jnp.where(
        none_gt, jnp.where(valid, -1, -2).astype(jnp.int32), assign
    )

    max_iou_real = jnp.where(gt_mask[None, :], iou, -jnp.inf).max(axis=1)
    return assign, max_iou_real
