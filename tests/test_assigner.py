import numpy as np
import jax.numpy as jnp

from s2anet_tpu.models.assigner import assign_labels
from s2anet_tpu.ops.polyiou_ref import box_iou_rotated_np
from s2anet_tpu.ops.rbox import PI


def assign_oracle(anchors, gt, imgs_size=(1024, 1024), pos=0.5, neg=0.4,
                  min_pos=0.0):
    """NumPy re-derivation of the reference assignment rules
    (models/utils.py:33-147) with double-precision IoU."""
    a = len(anchors)
    out = np.full(a, -2, np.int64)
    valid = (
        (anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
        & (anchors[:, 0] <= imgs_size[1]) & (anchors[:, 1] <= imgs_size[0])
        & (anchors[:, 2] < imgs_size[1]) & (anchors[:, 3] < imgs_size[0])
    )
    if len(gt) == 0:
        out[valid] = -1
        return out
    iou = box_iou_rotated_np(anchors, gt)
    iou[(iou < 0) | (iou > 1)] = -0.5
    iou[~valid] = -0.5
    max_iou = iou.max(1)
    argmax = iou.argmax(1)
    out[(max_iou >= 0) & (max_iou < neg)] = -1
    p = max_iou >= pos
    out[p] = argmax[p]
    gt_max = iou.max(0)
    for i in range(len(gt)):
        if gt_max[i] > min_pos:
            # framework semantics: ties within 1e-6 of the gt's best IoU all
            # claim (the reference's exact-equality tie test is fp-noise
            # dependent; we specify the tolerant rule)
            out[iou[:, i] >= gt_max[i] - 1e-6] = i
    return out


def make_anchors(img=256, stride=32):
    n = img // stride
    ys, xs = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    ctr = np.stack([xs, ys], -1).reshape(-1, 2) * stride + 0.5 * (stride - 1)
    anchors = np.concatenate(
        [ctr, np.full((n * n, 1), 4.0 * stride), np.full((n * n, 1), 4.0 * stride),
         np.zeros((n * n, 1))], axis=1
    ).astype(np.float32)
    return anchors


def pad_gt(gt, classes, g_max=16):
    g = len(gt)
    boxes = np.zeros((g_max, 5), np.float32)
    cls = np.zeros((g_max,), np.int32)
    mask = np.zeros((g_max,), bool)
    boxes[:g] = gt
    cls[:g] = classes
    mask[:g] = True
    return boxes, cls, mask


def test_assign_matches_oracle(rng):
    anchors = make_anchors()
    gt = np.array(
        [
            [100, 100, 80, 40, 0.3],
            [40, 200, 200, 30, 1.2],
            [220, 60, 30, 20, -0.5],
        ],
        np.float32,
    )
    boxes, cls, mask = pad_gt(gt, [0, 1, 2])
    got, _ = assign_labels(
        jnp.asarray(anchors), jnp.asarray(boxes), jnp.asarray(mask),
        imgs_size=(256, 256),
    )
    want = assign_oracle(anchors.astype(np.float64), gt.astype(np.float64),
                         imgs_size=(256, 256))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_assign_no_gt_all_negative():
    anchors = make_anchors()
    boxes = np.zeros((8, 5), np.float32)
    mask = np.zeros((8,), bool)
    got, _ = assign_labels(
        jnp.asarray(anchors), jnp.asarray(boxes), jnp.asarray(mask),
        imgs_size=(256, 256),
    )
    assert (np.asarray(got) == -1).all()


def test_assign_invalid_anchor_is_ignore():
    anchors = np.array(
        [
            [-10, 50, 40, 40, 0.0],   # center left of image -> invalid
            [50, 50, 40, 40, 0.0],    # valid
            [50, 50, 5000, 40, 0.0],  # wider than the image -> invalid
        ],
        np.float32,
    )
    boxes = np.zeros((4, 5), np.float32)
    mask = np.zeros((4,), bool)
    got, _ = assign_labels(
        jnp.asarray(anchors), jnp.asarray(boxes), jnp.asarray(mask),
        imgs_size=(256, 256),
    )
    assert np.asarray(got).tolist() == [-2, -1, -2]


def test_assign_gt_fallback_low_iou():
    # one tiny gt that overlaps no anchor above 0.5: the best anchor claims it
    anchors = make_anchors()
    gt = np.array([[100, 100, 10, 6, 0.2]], np.float32)
    boxes, cls, mask = pad_gt(gt, [0])
    got, _ = assign_labels(
        jnp.asarray(anchors), jnp.asarray(boxes), jnp.asarray(mask),
        imgs_size=(256, 256),
    )
    got = np.asarray(got)
    assert (got == 0).sum() >= 1
    want = assign_oracle(anchors.astype(np.float64), gt.astype(np.float64),
                         imgs_size=(256, 256))
    np.testing.assert_array_equal(got, want)


def test_assign_many_random_configs(rng):
    anchors = make_anchors(img=128, stride=16)
    for trial in range(5):
        g = int(rng.integers(1, 6))
        gt = np.stack(
            [
                rng.uniform(10, 118, g),
                rng.uniform(10, 118, g),
                rng.uniform(10, 100, g),
                rng.uniform(5, 50, g),
                rng.uniform(-PI / 4, 3 * PI / 4, g),
            ],
            axis=1,
        ).astype(np.float32)
        gt[:, 3] = np.minimum(gt[:, 2], gt[:, 3])
        boxes, cls, mask = pad_gt(gt, list(range(g)))
        got, _ = assign_labels(
            jnp.asarray(anchors), jnp.asarray(boxes), jnp.asarray(mask),
            imgs_size=(128, 128),
        )
        want = assign_oracle(anchors.astype(np.float64), gt.astype(np.float64),
                             imgs_size=(128, 128))
        # fp32 vs fp64 IoU can flip borderline threshold decisions; demand
        # exact match on >=99% of anchors and no structural disagreements
        agree = (np.asarray(got) == want).mean()
        assert agree >= 0.99, f"trial {trial}: agreement {agree}"


def test_assign_gt_tier_exactness(rng):
    """The adaptive gt tier must not change results when few gts are real."""
    anchors = make_anchors(img=128, stride=16)
    gt = np.array([[60, 60, 40, 20, 0.3], [30, 90, 30, 10, 1.0]], np.float32)
    boxes = np.zeros((128, 5), np.float32)
    cls = np.zeros((128,), np.int32)
    mask = np.zeros((128,), bool)
    boxes[:2] = gt
    mask[:2] = True
    a_tier, m_tier = assign_labels(
        jnp.asarray(anchors), jnp.asarray(boxes), jnp.asarray(mask),
        imgs_size=(128, 128), gt_tier=64,
    )
    a_full, m_full = assign_labels(
        jnp.asarray(anchors), jnp.asarray(boxes), jnp.asarray(mask),
        imgs_size=(128, 128), gt_tier=0,
    )
    np.testing.assert_array_equal(np.asarray(a_tier), np.asarray(a_full))
    # and when MORE than tier gts are real, the big path runs and matches too
    mask[:80] = True
    boxes[2:80] = np.stack([
        rng.uniform(10, 118, 78), rng.uniform(10, 118, 78),
        rng.uniform(10, 60, 78), rng.uniform(5, 30, 78),
        rng.uniform(-PI / 4, 3 * PI / 4, 78)], axis=1)
    a_tier2, _ = assign_labels(
        jnp.asarray(anchors), jnp.asarray(boxes), jnp.asarray(mask),
        imgs_size=(128, 128), gt_tier=64,
    )
    a_full2, _ = assign_labels(
        jnp.asarray(anchors), jnp.asarray(boxes), jnp.asarray(mask),
        imgs_size=(128, 128), gt_tier=0,
    )
    np.testing.assert_array_equal(np.asarray(a_tier2), np.asarray(a_full2))
