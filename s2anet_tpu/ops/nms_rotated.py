"""Rotated NMS on TPU — static shapes, never leaves the device.

Replaces the reference's CUDA bitmask kernel + host-side bit sweep
(/root/reference/utils/nms_rotated/src/nms_rotated_cuda.cu:14-125 and the
ml_nms variant in utils/ml_nms_rotated/) with an on-device formulation:
the inherently sequential greedy sweep runs as a ``lax.fori_loop`` over
``block``-row tiles of score-sorted candidates, with each tile's pairwise
rotated IoU computed on the fly inside the loop body (see
``_greedy_sweep_fused``) — no [K, K] matrix in HBM, no device->host round
trip, so decode + NMS stays inside one jit region (the reference syncs to
CPU for the bit sweep).

Dynamic candidate counts are replaced by fixed-capacity buffers + validity
masks: candidates below the score threshold carry score -1 and a False mask,
and simply never suppress anyone.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .iou_rotated import _iou_block


def _greedy_sweep_fused(boxes, alive0, iou_thr, labels=None,
                        block: int = 256):
    """Greedy suppression with the pairwise IoU computed INSIDE the sweep.

    The materialized [K, K] overlap matrix of the two-phase design cost a
    71 MB HBM round-trip per image plus a ~n_blocks^2/2-op stitching chain
    that dominated trace/compile time. Here each outer step computes its
    [block, K] IoU rows on the fly (VPU work fused with the suppression
    masks), so the full matrix never exists anywhere: less HBM traffic,
    ~10x fewer HLO ops, identical results.

    Args:
      boxes:  [K, 5] score-sorted candidates.
      alive0: [K] bool initial validity.
      iou_thr: suppression threshold.
      labels: optional [K] int — boxes of different labels never suppress
        (ml_nms semantics).

    Returns:
      [K] bool survivors, in the sorted order.
    """
    k = boxes.shape[0]
    if k == 0 or block == 0:  # empty candidate set: nothing to suppress
        return alive0[:k]
    pad = (-k) % block
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        alive0 = jnp.pad(alive0, (0, pad))
        if labels is not None:
            labels = jnp.pad(labels, (0, pad), constant_values=-1)
    kp = k + pad
    n_blocks = kp // block
    ridx = jnp.arange(block)
    cidx = jnp.arange(kp)

    def outer(bi, alive):
        start = bi * block
        rows_boxes = jax.lax.dynamic_slice(boxes, (start, 0), (block, 5))
        overlap = _iou_block(rows_boxes, boxes) > iou_thr      # [block, K]
        if labels is not None:
            row_lab = jax.lax.dynamic_slice(labels, (start,), (block,))
            overlap &= row_lab[:, None] == labels[None, :]
        # strictly-later columns only (upper triangle of the full matrix)
        overlap &= cidx[None, :] > (start + ridx)[:, None]
        tile = jax.lax.dynamic_slice(overlap, (0, start), (block, block))
        a_b = jax.lax.dynamic_slice(alive, (start,), (block,))

        def inner(r, a):
            return a & ~(tile[r] & a[r])

        a_b = jax.lax.fori_loop(0, block, inner, a_b)
        # bulk-suppress every candidate hit by a surviving row. This covers
        # the block's OWN columns too: a within-block kill means an alive
        # earlier row overlaps it (-> in hit), and a within-block survivor
        # is by construction hit by no alive row — so writing a_b back into
        # alive first would be redundant.
        hit = jnp.any(overlap & a_b[:, None], axis=0)
        return alive & ~hit

    return jax.lax.fori_loop(0, n_blocks, outer, alive0)[:k]


@functools.partial(jax.jit, static_argnames=("block_n",))
def nms_rotated(boxes, scores, iou_thr: float = 0.5, valid=None, block_n: int = 256):
    """Single-class rotated NMS.

    Args:
      boxes:  ``[K, 5]`` rotated boxes.
      scores: ``[K]``.
      iou_thr: suppression threshold.
      valid:  optional ``[K]`` bool mask of live candidates.

    Returns:
      ``keep`` — ``[K]`` bool mask in the *input* order.
      Parity: /root/reference/utils/nms_rotated/__init__.py:6.
    """
    k = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((k,), bool)
    s = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-s)
    b = boxes[order]
    alive = _greedy_sweep_fused(b, valid[order], iou_thr,
                                block=min(block_n, k))
    return jnp.zeros((k,), bool).at[order].set(alive)


@functools.partial(jax.jit, static_argnames=("block_n",))
def ml_nms_rotated(
    boxes, scores, labels, iou_thr: float = 0.5, valid=None, block_n: int = 256
):
    """Multi-label rotated NMS: boxes of different labels never suppress each
    other (IoU across classes forced to 0, mirroring
    /root/reference/utils/ml_nms_rotated/src/box_iou_rotated_utils.h:317-322).

    Returns ``[K]`` bool keep mask in input order.
    """
    k = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((k,), bool)
    s = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-s)
    b = boxes[order]
    lab = labels[order]
    alive = _greedy_sweep_fused(b, valid[order], iou_thr, labels=lab,
                                block=min(block_n, k))
    return jnp.zeros((k,), bool).at[order].set(alive)


@functools.partial(
    jax.jit,
    static_argnames=("max_per_img", "pre_nms_cap", "block_n", "small_tier"),
)
def multiclass_nms_rotated(
    bboxes,
    scores,
    score_thr: float = 0.05,
    iou_thr: float = 0.5,
    max_per_img: int = 2000,
    pre_nms_cap: int = 4096,
    block_n: int = 256,
    small_tier: int = 512,
):
    """Per-image multiclass rotated NMS with fixed output capacity.

    Mirrors /root/reference/utils/bbox_nms_rotated.py:5-67: each box is
    duplicated per class, filtered by ``score_thr``, suppressed per-class,
    capped at ``max_per_img``. Dynamic shapes are replaced by a fixed
    ``pre_nms_cap`` top-k candidate buffer and a validity mask.

    Known, bounded divergence from the reference: when MORE than
    ``pre_nms_cap`` (box, class) pairs exceed ``score_thr``, the lowest-
    scored excess never enters NMS (the reference suppresses all of them).
    Survivors are unaffected (truncation removes the weakest candidates,
    which cannot suppress a higher-scored box); only sub-tail detections
    past ~4096 candidates/image can be lost vs the reference. Raise
    ``pre_nms_cap`` (config ``model.pre_nms_cap``) for pathological crowds.

    Adaptive cost, exact semantics: candidates are score-sorted, so when at
    most ``small_tier`` of them pass the score threshold, NMS over the first
    ``small_tier`` slice is *identical* to NMS over all of them. A
    ``lax.cond`` dispatches to the small tier at runtime — on trained models
    (hundreds of candidates above 0.05 per chip) this skips ~94% of the
    pairwise IoU work. Set ``small_tier=0`` to disable.

    Args:
      bboxes: ``[N, 5]`` decoded rotated boxes.
      scores: ``[N, C]`` per-class probabilities (post-sigmoid).

    Returns:
      ``det_boxes [max_per_img, 6]`` (x, y, w, h, theta, score),
      ``det_labels [max_per_img]`` int32,
      ``det_valid [max_per_img]`` bool.
    """
    n, c = scores.shape
    flat = scores.reshape(-1)
    flat = jnp.where(flat > score_thr, flat, -1.0)
    k = min(pre_nms_cap, n * c)
    top_scores, top_idx = jax.lax.top_k(flat, k)
    cand_boxes = bboxes[top_idx // c]
    cand_labels = (top_idx % c).astype(jnp.int32)
    cand_valid = top_scores > score_thr

    def sweep_slice(kk):
        def run(_):
            alive_k = _greedy_sweep_fused(
                cand_boxes[:kk], cand_valid[:kk], iou_thr,
                labels=cand_labels[:kk], block=min(block_n, kk),
            )
            return jnp.pad(alive_k, (0, k - kk))

        return run

    if 0 < small_tier < k:
        n_valid = cand_valid.sum()
        alive = jax.lax.cond(
            n_valid <= small_tier, sweep_slice(small_tier), sweep_slice(k),
            operand=None,
        )
    else:
        alive = sweep_slice(k)(None)
    alive = alive & cand_valid

    kept_scores = jnp.where(alive, top_scores, -1.0)
    sel_scores, sel = jax.lax.top_k(kept_scores, min(max_per_img, k))
    det_valid = sel_scores > score_thr
    det_boxes = jnp.concatenate(
        [cand_boxes[sel], jnp.maximum(sel_scores, 0.0)[:, None]], axis=1
    )
    det_labels = cand_labels[sel]
    if max_per_img > k:  # pad up to the static output size
        pad = max_per_img - k
        det_boxes = jnp.pad(det_boxes, ((0, pad), (0, 0)))
        det_labels = jnp.pad(det_labels, (0, pad))
        det_valid = jnp.pad(det_valid, (0, pad))
    return det_boxes, det_labels, det_valid
