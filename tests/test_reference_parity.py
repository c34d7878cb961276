"""Numerical parity against the ACTUAL reference implementation (torch CPU).

Round-1 golden tests compared against this repo's own NumPy oracles;
these tests import the reference's torch modules directly (via
tests/refshim.py, which shims only the compiled CUDA extensions) and assert
that every piece of training math matches the reference itself:

  * norm_angle                      vs utils/general.py:925-929
  * rboxes_encode / rboxes_decode   vs models/boxes.py:82-247
  * fam_bbox_decode                 vs models/head.py:27-52
  * anchor grids                    vs models/anchors.py:36-126 (exact)
  * assign_labels codes             vs models/utils.py:33-147 (exact, shared
                                       IoU matrix on both sides)
  * FocalLoss / SmoothL1Loss        vs utils/loss.py:31-126
  * full S2ANet forward             vs models/detector.py (slow; random
                                       reference weights imported through
                                       convert_reference_s2anet)
  * compute_loss                    vs models/head.py:353-436 (slow)
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from refshim import load_reference

from s2anet_tpu.models.anchors import grid_anchors
from s2anet_tpu.models.assigner import assign_from_iou
from s2anet_tpu.models.losses import focal_loss_with_logits, smooth_l1_loss
from s2anet_tpu.ops.rbox import norm_angle, rboxes_decode, rboxes_encode


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _rand_rboxes(rng, n, lo=8.0, hi=200.0):
    out = np.stack(
        [
            rng.uniform(0, 1024, n),
            rng.uniform(0, 1024, n),
            rng.uniform(lo, hi, n),
            rng.uniform(lo, hi, n),
            rng.uniform(-np.pi / 4, 3 * np.pi / 4, n),
        ],
        axis=1,
    ).astype(np.float32)
    return out


# ------------------------------------------------------------------ geometry
def test_norm_angle_parity(ref, rng):
    ang = rng.uniform(-4 * np.pi, 4 * np.pi, 4096).astype(np.float32)
    want = ref.general.norm_angle(torch.from_numpy(ang)).numpy()
    got = np.asarray(norm_angle(jnp.asarray(ang)))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("relative", [True, False])
def test_rboxes_encode_parity(ref, rng, relative):
    anchors = _rand_rboxes(rng, 512)
    gts = _rand_rboxes(rng, 512)
    want = ref.boxes.rboxes_encode(
        torch.from_numpy(anchors), torch.from_numpy(gts),
        is_encode_relative=relative,
    ).numpy()
    got = np.asarray(
        rboxes_encode(jnp.asarray(anchors), jnp.asarray(gts),
                      is_encode_relative=relative)
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("clip", [16 / 1000, 1e-6])
@pytest.mark.parametrize("relative", [True, False])
def test_rboxes_decode_parity(ref, rng, relative, clip):
    anchors = _rand_rboxes(rng, 512)
    deltas = rng.normal(0, 1.5, (512, 5)).astype(np.float32)
    want = ref.boxes.rboxes_decode(
        torch.from_numpy(anchors), torch.from_numpy(deltas),
        is_encode_relative=relative, wh_ratio_clip=clip,
    ).numpy()
    got = np.asarray(
        rboxes_decode(jnp.asarray(anchors), jnp.asarray(deltas),
                      is_encode_relative=relative, wh_ratio_clip=clip)
    )
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-5)


def test_encode_decode_roundtrip_vs_reference(ref, rng):
    """encode ∘ decode == id on both sides, and cross-implementation:
    my decode inverts the reference's encode."""
    anchors = _rand_rboxes(rng, 256)
    gts = _rand_rboxes(rng, 256, lo=16.0, hi=120.0)
    ref_deltas = ref.boxes.rboxes_encode(
        torch.from_numpy(anchors), torch.from_numpy(gts)
    ).numpy()
    got = np.asarray(
        rboxes_decode(jnp.asarray(anchors), jnp.asarray(ref_deltas),
                      wh_ratio_clip=1e-6)
    )
    np.testing.assert_allclose(got[:, :4], gts[:, :4], atol=1e-2, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(norm_angle(jnp.asarray(got[:, 4] - gts[:, 4]))),
        np.zeros(256), atol=1e-4,
    )


def test_fam_bbox_decode_parity(ref, rng):
    b, h, w = 2, 8, 11
    preds = rng.normal(0, 1.0, (b, 5, h, w)).astype(np.float32)
    anchors = _rand_rboxes(rng, h * w)
    want = ref.head.fam_bbox_decode(
        torch.from_numpy(preds), torch.from_numpy(anchors)
    ).numpy()  # [B, H, W, 5]
    deltas = jnp.asarray(preds).transpose(0, 2, 3, 1).reshape(b, h * w, 5)
    got = np.asarray(
        rboxes_decode(
            jnp.broadcast_to(jnp.asarray(anchors)[None], (b, h * w, 5)),
            deltas, wh_ratio_clip=1e-6,
        )
    ).reshape(b, h, w, 5)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-5)


# ------------------------------------------------------------------- anchors
@pytest.mark.parametrize(
    "featmap,stride,scales,ratios,angles",
    [
        ((128, 128), 8, (4.0,), (1.0,), (0.0,)),
        ((16, 16), 64, (4.0,), (1.0,), (0.0,)),
        ((8, 8), 128, (4.0,), (1.0,), (0.0,)),
        ((7, 5), 16, (4.0, 8.0), (1.0, 2.0, 4.0), (0.0, np.pi / 4)),
    ],
)
def test_anchor_grid_parity(ref, featmap, stride, scales, ratios, angles):
    gen = ref.anchors.AnchorGeneratorRotated(
        anchor_base_size=stride, scales=list(scales), ratios=list(ratios),
        angles=list(angles),
    )
    want = gen.gen_grid_anchors(featmap, stride).numpy().reshape(-1, 5)
    got = grid_anchors(featmap, stride, scales, ratios, angles)
    np.testing.assert_allclose(got, want, atol=1e-4)


# ------------------------------------------------------------------ assigner
def _quantized_iou(rng, a, g):
    """IoU values on a 1e-3 grid (exact ties happen, near-ties don't)."""
    iou = rng.integers(0, 1001, size=(a, g)).astype(np.float32) / 1000.0
    # sprinkle out-of-range values to exercise the invalid-IoU clamp
    bad = rng.random((a, g)) < 0.02
    iou = np.where(bad, rng.choice([-0.25, 1.5], size=(a, g)), iou)
    # make positives sparse, like real assignment
    iou = np.where(rng.random((a, g)) < 0.9, iou * 0.45, iou)
    return iou.astype(np.float32)


@pytest.mark.parametrize("num_gt", [0, 1, 7, 40])
def test_assigner_code_parity(ref, num_gt):
    rng = np.random.default_rng(num_gt)
    a, g_pad = 300, 48
    anchors = _rand_rboxes(rng, a)
    # push some anchors out of the image -> invalid -> ignore
    anchors[: a // 10, 0] = -5.0
    anchors[a // 10 : a // 8, 2] = 2000.0
    iou = _quantized_iou(rng, a, num_gt) if num_gt else np.zeros((a, 0), np.float32)
    gts = _rand_rboxes(rng, num_gt)

    with torch.no_grad():
        orig = ref.model_utils.bbox_iou_rotated
        ref.model_utils.bbox_iou_rotated = (
            lambda b1, b2: torch.from_numpy(iou.copy())
        )
        try:
            want = ref.model_utils.assign_labels(
                torch.from_numpy(anchors), torch.from_numpy(gts),
                imgs_size=(1024, 1024),
            ).numpy()
        finally:
            ref.model_utils.bbox_iou_rotated = orig

    iou_pad = np.zeros((a, g_pad), np.float32)
    iou_pad[:, :num_gt] = iou
    gt_mask = np.zeros(g_pad, bool)
    gt_mask[:num_gt] = True
    valid = (
        (anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
        & (anchors[:, 0] <= 1024) & (anchors[:, 1] <= 1024)
        & (anchors[:, 2] < 1024) & (anchors[:, 3] < 1024)
    )
    got = np.asarray(
        assign_from_iou(
            jnp.asarray(iou_pad), jnp.asarray(valid), jnp.asarray(gt_mask)
        )[0]
    )
    np.testing.assert_array_equal(got, want)


# -------------------------------------------------------------------- losses
def test_focal_loss_parity(ref, rng):
    logits = rng.normal(0, 3, (400, 15)).astype(np.float32)
    targets = (rng.random((400, 15)) < 0.05).astype(np.float32)
    crit = ref.loss.FocalLoss(
        torch.nn.BCEWithLogitsLoss(reduction="sum"), gamma=2.0, alpha=0.5
    )
    want = crit(torch.from_numpy(logits), torch.from_numpy(targets)).item()
    got = float(
        focal_loss_with_logits(
            jnp.asarray(logits), jnp.asarray(targets), 2.0, 0.5
        ).sum()
    )
    assert abs(got - want) < 1e-3 * max(1.0, abs(want))


def test_smooth_l1_parity(ref, rng):
    pred = rng.normal(0, 1, (300, 5)).astype(np.float32)
    target = pred + rng.normal(0, 0.3, (300, 5)).astype(np.float32)
    crit = ref.loss.SmoothL1Loss(beta=1.0 / 9.0, reduction="sum")
    want = crit(torch.from_numpy(pred), torch.from_numpy(target)).item()
    got = float(
        smooth_l1_loss(jnp.asarray(pred), jnp.asarray(target), 1.0 / 9.0).sum()
    )
    assert abs(got - want) < 1e-4 * max(1.0, abs(want))


# ------------------------------------------------- full-model forward + loss
@pytest.fixture(scope="module")
def ref_model_and_mine(ref):
    """Reference S2ANet (random weights, CPU shims) + my model w/ imported
    weights, plus a shared random input batch."""
    from s2anet_tpu.models.detector import S2ANet
    from s2anet_tpu.models.torch_import import convert_reference_s2anet

    torch.manual_seed(7)
    tmodel = ref.detector.S2ANet(backbone_name="resnet50", num_classes=6)
    tmodel.eval()
    # randomize BN running stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.7, 1.3)

    variables = convert_reference_s2anet(
        {k: v for k, v in tmodel.state_dict().items()}, "resnet50"
    )
    fmodel = S2ANet(backbone_name="resnet50", num_classes=6)

    rng = np.random.default_rng(0)
    imgs = rng.random((1, 3, 160, 160)).astype(np.float32)
    return tmodel, fmodel, variables, imgs


@pytest.mark.slow
def test_full_forward_parity(ref, ref_model_and_mine):
    tmodel, fmodel, variables, imgs = ref_model_and_mine
    with torch.no_grad():
        p = tmodel(torch.from_numpy(imgs))["pred"]

    out = fmodel.apply(
        variables, jnp.asarray(np.transpose(imgs, (0, 2, 3, 1))), train=False
    )

    names = ["fam_cls", "fam_bbox", "odm_cls", "odm_bbox"]
    for t_idx, name in enumerate(names):
        for lvl in range(5):
            want = p[t_idx][lvl].numpy()  # [B, C, H, W]
            got = np.transpose(
                np.asarray(out[name][lvl], dtype=np.float32), (0, 3, 1, 2)
            )
            np.testing.assert_allclose(
                got, want, atol=5e-3, rtol=1e-3,
                err_msg=f"{name} level {lvl}",
            )
    # refined anchors (decode of detached FAM deltas)
    for lvl in range(5):
        want = p[5][lvl].numpy().reshape(1, -1, 5)
        got = np.asarray(out["refine_anchors"][lvl], dtype=np.float32)
        np.testing.assert_allclose(
            got[..., :4], want[..., :4], atol=2e-2, rtol=1e-3,
            err_msg=f"refine_anchors level {lvl}",
        )
        dth = np.asarray(norm_angle(jnp.asarray(got[..., 4] - want[..., 4])))
        np.testing.assert_allclose(dth, np.zeros_like(dth), atol=1e-4)


@pytest.mark.slow
def test_compute_loss_parity(ref, ref_model_and_mine):
    from s2anet_tpu.models.head import compute_s2anet_loss

    tmodel, fmodel, variables, imgs = ref_model_and_mine
    rng = np.random.default_rng(3)
    n_obj = 6
    gts = np.stack(
        [
            rng.uniform(20, 140, n_obj),
            rng.uniform(20, 140, n_obj),
            rng.uniform(10, 50, n_obj),
            rng.uniform(8, 30, n_obj),
            rng.uniform(-np.pi / 4, 3 * np.pi / 4, n_obj),
        ],
        axis=1,
    ).astype(np.float32)
    cls_ids = rng.integers(0, 6, n_obj)

    # reference targets: [img_idx, cls, x, y, w, h, theta] with xywh
    # NORMALIZED (head.forward rescales by imgs_size, head.py:276-279)
    targets = np.zeros((n_obj, 7), np.float32)
    targets[:, 0] = 0
    targets[:, 1] = cls_ids
    targets[:, 2] = gts[:, 0] / 160.0
    targets[:, 3] = gts[:, 1] / 160.0
    targets[:, 4] = gts[:, 2] / 160.0
    targets[:, 5] = gts[:, 3] / 160.0
    targets[:, 6] = gts[:, 4]

    with torch.no_grad():
        res = tmodel(
            torch.from_numpy(imgs), targets=torch.from_numpy(targets)
        )
    want_items = np.asarray(res["loss_items"], dtype=np.float32)

    out = fmodel.apply(
        variables, jnp.asarray(np.transpose(imgs, (0, 2, 3, 1))), train=False
    )
    g_pad = 16
    gt_boxes = np.zeros((1, g_pad, 5), np.float32)
    gt_boxes[0, :n_obj] = gts
    gt_classes = np.zeros((1, g_pad), np.int32)
    gt_classes[0, :n_obj] = cls_ids
    gt_mask = np.zeros((1, g_pad), bool)
    gt_mask[0, :n_obj] = True

    total, items = compute_s2anet_loss(
        out, jnp.asarray(gt_boxes), jnp.asarray(gt_classes),
        jnp.asarray(gt_mask), imgs_size=(160, 160), num_classes=6,
    )
    got_items = np.asarray(items, dtype=np.float32)
    np.testing.assert_allclose(got_items, want_items, atol=5e-3, rtol=2e-2)
    assert abs(float(total) - float(res["loss"])) < 5e-2


@pytest.mark.slow
def test_get_bboxes_parity(ref, ref_model_and_mine):
    """End-to-end decode + multiclass rotated NMS vs the reference
    (head.py:648-726 + utils/bbox_nms_rotated.py), on shared random weights.

    Random-weight ODM scores sit near sigmoid(bias)=0.01, so the production
    score_thr=0.05 would select nothing; the threshold is lowered on BOTH
    sides to make NMS non-trivial. The reference side runs on the fp64
    polygon-clipping oracle while mine runs the fp32 XLA IoU, so a tiny
    fraction of borderline suppressions may flip — the assertion requires a
    1:1 greedy match of >=95% of detections.
    """
    from s2anet_tpu.models.head import s2anet_get_bboxes

    tmodel, fmodel, variables, imgs = ref_model_and_mine
    with torch.no_grad():
        p = tmodel(torch.from_numpy(imgs))["pred"]
        # pick a threshold that lets ~200 candidate (box, class) pairs through
        all_scores = torch.cat(
            [c[0].sigmoid().permute(1, 2, 0).reshape(-1) for c in p[2]]
        )
        thr = float(torch.topk(all_scores, 200).values[-1])

        tmodel.head.score_thres_before_nms = thr
        res = tmodel(torch.from_numpy(imgs), post_process=True)
    want_boxes, want_labels = res["boxes_ls"][0]
    want_boxes = want_boxes.numpy()
    want_labels = want_labels.numpy().reshape(-1)

    out = fmodel.apply(
        variables, jnp.asarray(np.transpose(imgs, (0, 2, 3, 1))), train=False
    )
    det, labels, valid = jax.tree.map(
        np.asarray,
        s2anet_get_bboxes(out, score_thr=thr, iou_thr=0.5, pre_nms_cap=1024),
    )
    det, labels = det[0][valid[0]], labels[0][valid[0]]

    assert abs(len(det) - len(want_boxes)) <= max(2, 0.05 * len(want_boxes))
    # greedy 1:1 match on (label, score, center)
    used = np.zeros(len(want_boxes), bool)
    matched = 0
    for i in range(len(det)):
        cand = np.nonzero(
            (~used)
            & (want_labels == labels[i])
            & (np.abs(want_boxes[:, 5] - det[i, 5]) < 1e-3)
            & (np.linalg.norm(want_boxes[:, :2] - det[i, :2], axis=1) < 1.0)
        )[0]
        if len(cand):
            used[cand[0]] = True
            matched += 1
    assert matched >= 0.95 * max(len(det), len(want_boxes))


# ---------------------------------------------------------------- mosaic
def test_mosaic_matches_reference_center_crop(rng):
    """Our mosaic4 + mosaic_center_crop equals the reference's load_mosaic +
    random_perspective_rotation(border=-s/2) pixel-exactly when every random
    draw is pinned to its midpoint (the published recipe runs the warp with
    degrees=translate=scale=shear=perspective=0, so the only randomness is
    the mosaic center).  Ref: datasets_rotation.py:603-660,
    augmentations.py:93-175."""
    import random as pyrandom
    import types

    ns = load_reference()
    s = 64
    imgs = [np.ascontiguousarray(
        rng.integers(0, 255, (s, s, 3)).astype(np.uint8)) for _ in range(4)]
    labels = []
    for i in range(4):
        poly = np.array([0.3, 0.3, 0.7, 0.35, 0.65, 0.7, 0.25, 0.65])
        poly = (poly + 0.02 * i).clip(0, 1)
        labels.append(np.concatenate([[float(i % 3)], poly])[None].astype(np.float32))

    fake_self = types.SimpleNamespace(
        img_size=s, mosaic_border=[-s // 2, -s // 2],
        indices=list(range(4)), labels=labels,
        hyp={"degrees": 0, "translate": 0, "scale": 0, "shear": 0,
             "perspective": 0},
    )

    orig_load = ns.datasets.load_image
    orig_uniform = pyrandom.uniform
    orig_choices = pyrandom.choices
    orig_shuffle = pyrandom.shuffle
    try:
        ns.datasets.load_image = (
            lambda self, i: (imgs[i], (s, s), (s, s)))
        pyrandom.uniform = lambda a, b: (a + b) / 2.0   # center of range
        pyrandom.choices = lambda seq, k: list(seq[1:k + 1])
        pyrandom.shuffle = lambda x: None
        ref_img, ref_labels = ns.datasets.load_mosaic(fake_self, 0)
    finally:
        ns.datasets.load_image = orig_load
        pyrandom.uniform = orig_uniform
        pyrandom.choices = orig_choices
        pyrandom.shuffle = orig_shuffle

    from s2anet_tpu.data.augment import mosaic4, mosaic_center_crop

    class FakeRng:
        def uniform(self, a=0.0, b=1.0, size=None):
            return (a + b) / 2.0
        def integers(self, a, b=None):
            return a

    samples = []
    for i in range(4):
        polys = labels[i][:, 1:].copy()
        polys[:, 0::2] *= s
        polys[:, 1::2] *= s
        samples.append((imgs[i], polys, labels[i][:, 0].astype(np.int32)))
    canvas, p4, c4 = mosaic4(samples, s, 114, FakeRng())
    our_img, our_p, our_c = mosaic_center_crop(canvas, p4, c4, s)

    assert ref_img.shape == our_img.shape == (s, s, 3)
    np.testing.assert_array_equal(np.asarray(our_img), ref_img)

    # same surviving label set, polygon coords within warp epsilon
    assert len(ref_labels) == len(our_p)
    ref_sorted = ref_labels[np.lexsort(ref_labels.T[::-1])]
    ours = np.concatenate([our_c[:, None].astype(np.float64), our_p], 1)
    ours_sorted = ours[np.lexsort(ours.T[::-1])]
    np.testing.assert_allclose(ours_sorted, ref_sorted, atol=1e-6)


# ----------------------------------------------------- letterbox / unscale
def test_letterbox_matches_reference(rng):
    """Pixel-exact letterbox parity (augmentations.py:59-90, auto=False)."""
    ns = load_reference()
    from s2anet_tpu.data.augment import letterbox

    for h, w, target in ((100, 160, 128), (200, 120, 256), (64, 64, 64)):
        img = np.ascontiguousarray(
            rng.integers(0, 255, (h, w, 3)).astype(np.uint8))
        ref_img, ref_ratio, (ref_dw, ref_dh) = ns.augmentations.letterbox(
            img.copy(), target, auto=False, scaleup=True)
        our_img, our_r, (our_left, our_top) = letterbox(img.copy(), target)
        np.testing.assert_array_equal(our_img, ref_img)
        assert our_r == pytest.approx(ref_ratio[0])
        # ours returns integer left/top pads; reference float half-pads
        assert our_left == int(round(ref_dw - 0.1))
        assert our_top == int(round(ref_dh - 0.1))


def test_unletterbox_matches_scale_coords_rotated(rng):
    """unletterbox_rboxes == scale_coords_rotated (general.py:629-649):
    subtract pad, divide x/y/w/h by gain, theta untouched, NO clipping."""
    import torch

    ns = load_reference()
    from s2anet_tpu.data.augment import unletterbox_rboxes

    h0, w0, s = 300, 400, 512
    gain = min(s / h0, s / w0)
    pad = ((s - w0 * gain) / 2, (s - h0 * gain) / 2)
    boxes = rng.uniform(-50, 560, (12, 6)).astype(np.float64)
    boxes[:, 2:4] = np.abs(boxes[:, 2:4]) + 1
    ref = ns.general.scale_coords_rotated(
        (s, s), torch.from_numpy(boxes.copy()), (h0, w0)).numpy()
    ours = unletterbox_rboxes(boxes[:, :5].copy(), gain, pad)
    np.testing.assert_allclose(ours, ref[:, :5], rtol=1e-9, atol=1e-9)


def test_hsv_augment_matches_reference(rng):
    """HSV LUT parity (augmentations.py:15-31) with pinned random gains."""
    ns = load_reference()
    from s2anet_tpu.data.augment import hsv_augment

    img = np.ascontiguousarray(
        rng.integers(0, 255, (48, 64, 3)).astype(np.uint8))
    # pin draws to 0.85 of the range — NOT the midpoint, which would give
    # identity gains (r = 0*g + 1) and a vacuous comparison
    def pinned(a, b, size=None):
        v = a + 0.85 * (b - a)
        return np.full(size, v) if size is not None else v

    orig_uniform = np.random.uniform
    try:
        np.random.uniform = pinned
        ref = img.copy()
        ns.augmentations.augment_hsv(ref, 0.3, 0.5, 0.4)  # in-place
    finally:
        np.random.uniform = orig_uniform

    class PinnedRng:
        def uniform(self, a=-1.0, b=1.0, size=None):
            return pinned(a, b, size)

    ours = hsv_augment(img.copy(), 0.3, 0.5, 0.4, rng=PinnedRng())
    assert not np.array_equal(ours, img)  # the gains actually did something
    np.testing.assert_array_equal(ours, ref)
