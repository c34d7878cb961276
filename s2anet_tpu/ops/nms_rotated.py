"""Rotated NMS on TPU — static shapes, never leaves the device.

Replaces the reference's CUDA bitmask kernel + host-side bit sweep
(/root/reference/utils/nms_rotated/src/nms_rotated_cuda.cu:14-125 and the
ml_nms variant in utils/ml_nms_rotated/) with an on-device formulation:

  * the pairwise rotated-IoU matrix of the (score-sorted) candidates is
    computed in upper-triangular block tiles (greedy NMS never consults the
    lower triangle);
  * the inherently sequential greedy sweep runs as a ``lax.fori_loop`` over
    rows of that matrix — no device->host round trip, so decode + NMS stays
    inside one jit region (the reference syncs to CPU for the bit sweep).

Dynamic candidate counts are replaced by fixed-capacity buffers + validity
masks: candidates below the score threshold carry score -1 and a False mask,
and simply never suppress anyone.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .iou_rotated import _iou_block


def _overlap_upper(boxes, block: int = 256):
    """Upper-triangular pairwise IoU of score-sorted candidates.

    Greedy NMS only consults pairs (i, j) with j > i, so the lower triangle
    of the [K, K] matrix is dead weight — computing only the
    (n_blocks * (n_blocks + 1) / 2) upper block-tiles saves ~45% of the
    polygon-clip work. Tiles are produced by one lax.map over the static
    block-pair list and stitched with dynamic_update_slice.
    """
    k = boxes.shape[0]
    if k <= block:
        return _iou_block(boxes, boxes)
    pad = (-k) % block
    b = jnp.pad(boxes, ((0, pad), (0, 0)))
    kp = k + pad
    nb = kp // block
    pairs = [(i, j) for i in range(nb) for j in range(i, nb)]
    pi = jnp.array([p[0] * block for p in pairs], jnp.int32)
    pj = jnp.array([p[1] * block for p in pairs], jnp.int32)

    def body(se):
        si, sj = se
        rows = jax.lax.dynamic_slice(b, (si, 0), (block, 5))
        cols = jax.lax.dynamic_slice(b, (sj, 0), (block, 5))
        return _iou_block(rows, cols)

    tiles = jax.lax.map(body, (pi, pj))  # [n_pairs, block, block]
    out = jnp.zeros((kp, kp), jnp.float32)
    for t, (i, j) in enumerate(pairs):
        out = jax.lax.dynamic_update_slice(
            out, tiles[t], (i * block, j * block)
        )
    return out[:k, :k]


def _greedy_sweep(overlap, alive0, block: int = 128):
    """Greedy suppression over score-descending candidates, blocked.

    Two-phase structure mirroring the reference CUDA kernel's 64-wide bitmask
    tiles + sequential sweep (nms_rotated_cuda.cu:14-125), but fully on-device:

      * the K-long sequential dependency chain is walked in ``block``-sized
        tiles: an inner fori_loop sweeps the [block, block] diagonal tile
        (small, VMEM-resident), then one vectorized [block, K] step applies
        the tile's survivors to all later candidates;
      * a naive K-step loop over [K, K] HBM rows is ~block-times more loop
        iterations of HBM traffic (and crashed the TPU runtime outright at
        K=4096).

    Args:
      overlap: [K, K] bool — True where candidate i suppresses candidate j
        (already thresholded + label-masked). Only the upper triangle is used.
      alive0:  [K] bool initial validity.

    Returns:
      [K] bool — survivors, in the same (sorted) order.
    """
    k = overlap.shape[0]
    if k % block != 0:
        pad = (-k) % block
        overlap = jnp.pad(overlap, ((0, pad), (0, pad)))
        alive0 = jnp.pad(alive0, (0, pad))
        return _greedy_sweep(overlap, alive0, block)[:k]

    n_blocks = k // block
    ridx = jnp.arange(block)
    cidx = jnp.arange(k)

    def outer(b, alive):
        start = b * block
        tile = jax.lax.dynamic_slice(overlap, (start, start), (block, block))
        a_b = jax.lax.dynamic_slice(alive, (start,), (block,))

        def inner(r, a):
            sup = tile[r] & (ridx > r) & a[r]
            return a & ~sup

        a_b = jax.lax.fori_loop(0, block, inner, a_b)
        alive = jax.lax.dynamic_update_slice(alive, a_b, (start,))
        # bulk-suppress every later candidate hit by a surviving row
        rows = jax.lax.dynamic_slice(overlap, (start, 0), (block, k))
        hit = jnp.any(rows & a_b[:, None], axis=0)
        return alive & ~(hit & (cidx >= start + block))

    return jax.lax.fori_loop(0, n_blocks, outer, alive0)


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
    iou = _overlap_upper(b, block=block_n)
    alive = _greedy_sweep(iou > iou_thr, valid[order])
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
    iou = _overlap_upper(b, block=block_n)
    same = lab[:, None] == lab[None, :]
    alive = _greedy_sweep(same & (iou > iou_thr), valid[order])
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
            iou = _overlap_upper(cand_boxes[:kk], block=min(block_n, kk))
            same = cand_labels[:kk, None] == cand_labels[None, :kk]
            alive_k = _greedy_sweep(same & (iou > iou_thr), cand_valid[:kk])
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
