import numpy as np
import jax.numpy as jnp

from s2anet_tpu.ops import nms_rotated, ml_nms_rotated, multiclass_nms_rotated
from s2anet_tpu.ops.polyiou_ref import box_iou_rotated_np
from s2anet_tpu.ops.rbox import PI


def nms_oracle(boxes, scores, iou_thr, labels=None):
    """Greedy NMS with double-precision IoU; returns kept indices (sorted)."""
    order = np.argsort(-scores, kind="stable")
    iou = box_iou_rotated_np(boxes, boxes)
    alive = np.ones(len(boxes), bool)
    keep = []
    for pos, i in enumerate(order):
        if not alive[i]:
            continue
        keep.append(int(i))
        for j in order[pos + 1 :]:
            if labels is not None and labels[i] != labels[j]:
                continue
            if iou[i, j] > iou_thr:
                alive[j] = False
    return sorted(keep)


def cluster_boxes(rng, n=50):
    centers = rng.uniform(50, 450, (6, 2))
    idx = rng.integers(0, 6, n)
    boxes = np.stack(
        [
            centers[idx, 0] + rng.normal(0, 5, n),
            centers[idx, 1] + rng.normal(0, 5, n),
            rng.uniform(20, 80, n),
            rng.uniform(10, 40, n),
            rng.uniform(-PI / 4, 3 * PI / 4, n),
        ],
        axis=1,
    ).astype(np.float32)
    scores = rng.uniform(0.05, 1.0, n).astype(np.float32)
    return boxes, scores


def test_nms_matches_oracle(rng):
    boxes, scores = cluster_boxes(rng)
    keep = np.asarray(nms_rotated(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    want = nms_oracle(boxes, scores, 0.5)
    got = sorted(np.nonzero(keep)[0].tolist())
    assert got == want


def test_nms_respects_valid_mask(rng):
    boxes, scores = cluster_boxes(rng, 30)
    valid = np.ones(30, bool)
    valid[::3] = False
    keep = np.asarray(
        nms_rotated(jnp.asarray(boxes), jnp.asarray(scores), 0.5, jnp.asarray(valid))
    )
    assert not keep[~valid].any()
    # invalid boxes must not suppress anyone: rerun with them removed
    keep_sub = np.asarray(
        nms_rotated(jnp.asarray(boxes[valid]), jnp.asarray(scores[valid]), 0.5)
    )
    assert np.array_equal(keep[valid], keep_sub)


def test_ml_nms_cross_class_no_suppression(rng):
    # identical boxes, different labels: all survive
    boxes = np.tile(np.array([[100, 100, 40, 20, 0.3]], np.float32), (4, 1))
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    labels = np.array([0, 1, 2, 3], np.int32)
    keep = np.asarray(
        ml_nms_rotated(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels), 0.5)
    )
    assert keep.all()
    # same label: only the best survives
    keep2 = np.asarray(
        ml_nms_rotated(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.zeros(4, jnp.int32), 0.5
        )
    )
    assert keep2.tolist() == [True, False, False, False]


def test_ml_nms_matches_oracle(rng):
    boxes, scores = cluster_boxes(rng, 40)
    labels = rng.integers(0, 3, 40).astype(np.int32)
    keep = np.asarray(
        ml_nms_rotated(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels), 0.5)
    )
    want = nms_oracle(boxes, scores, 0.5, labels)
    assert sorted(np.nonzero(keep)[0].tolist()) == want


def test_multiclass_nms_shapes_and_threshold(rng):
    n, c = 100, 15
    boxes, _ = cluster_boxes(rng, n)
    scores = rng.uniform(0, 0.6, (n, c)).astype(np.float32)
    det_boxes, det_labels, det_valid = multiclass_nms_rotated(
        jnp.asarray(boxes), jnp.asarray(scores), 0.05, 0.5, max_per_img=50,
        pre_nms_cap=256,
    )
    det_boxes, det_labels, det_valid = map(np.asarray, (det_boxes, det_labels, det_valid))
    assert det_boxes.shape == (50, 6)
    assert det_labels.shape == (50,)
    # all valid detections above threshold, sorted by score desc
    s = det_boxes[det_valid, 5]
    assert (s > 0.05).all()
    assert (np.diff(s) <= 1e-6).all()
    # invalid slots zeroed
    assert (det_boxes[~det_valid, 5] == 0).all()


def test_multiclass_nms_empty():
    boxes = jnp.zeros((10, 5)) + jnp.asarray([50, 50, 10, 5, 0.0])
    scores = jnp.full((10, 15), 0.01)  # everything below threshold
    det_boxes, det_labels, det_valid = multiclass_nms_rotated(
        boxes, scores, 0.05, 0.5, max_per_img=20, pre_nms_cap=64
    )
    assert not np.asarray(det_valid).any()


def test_nms_empty_inputs():
    """K=0 candidates must not crash the fused sweep (block would be 0)."""
    import jax.numpy as jnp

    keep = nms_rotated(jnp.zeros((0, 5)), jnp.zeros((0,)))
    assert keep.shape == (0,)
    keep_ml = ml_nms_rotated(jnp.zeros((0, 5)), jnp.zeros((0,)),
                             jnp.zeros((0,), jnp.int32))
    assert keep_ml.shape == (0,)
