import numpy as np
import pytest

from s2anet_tpu.data.split import (
    clip_objects_to_window,
    split_image,
    window_origins,
    parse_dota_label,
)
from s2anet_tpu.data.merge import (
    chip_to_image_coords,
    merge_chip_detections,
    parse_chip_name,
    poly_nms_np,
)
from s2anet_tpu.data import augment as A
from s2anet_tpu.eval.voc_eval import voc_ap, voc_eval_class, evaluate_detections


# ------------------------------------------------------------------- split
def test_window_origins_cover():
    origins = window_origins(2048, 3000, 1024, 824)
    lefts = sorted({l for l, _ in origins})
    ups = sorted({u for _, u in origins})
    assert lefts[0] == 0 and lefts[-1] + 1024 >= 3000
    assert ups[0] == 0 and ups[-1] + 1024 >= 2048
    # small image: single window
    assert window_origins(512, 512, 1024, 824) == [(0, 0)]


def test_clip_fully_inside_passthrough():
    obj = {"poly": np.array([10, 10, 50, 10, 50, 30, 10, 30], float),
           "name": "ship", "difficult": 0}
    out = clip_objects_to_window([obj], 0, 0, 100)
    assert len(out) == 1
    np.testing.assert_allclose(out[0]["poly"], obj["poly"])
    # window shifted: local coords
    out = clip_objects_to_window([obj], 5, 5, 100)
    np.testing.assert_allclose(out[0]["poly"][:2], [5, 5])


def test_clip_half_cut_keeps_when_majority_inside():
    # box straddles the right edge, 75% inside -> kept, clipped
    obj = {"poly": np.array([60, 10, 140, 10, 140, 50, 60, 50], float),
           "name": "ship", "difficult": 0}
    out = clip_objects_to_window([obj], 0, 0, 120, thresh=0.5)
    assert len(out) == 1
    assert out[0]["poly"][0::2].max() <= 120
    # only 25% inside -> dropped
    out = clip_objects_to_window([obj], 0, 0, 80, thresh=0.5)
    assert len(out) == 0


def test_clip_corner_cut_5pts_repaired():
    # rotated square cut at a window corner producing a 5-gon
    c, s = np.cos(0.4), np.sin(0.4)
    base = np.array([[-30, -30], [30, -30], [30, 30], [-30, 30]], float)
    rot = base @ np.array([[c, -s], [s, c]]).T + np.array([55, 55])
    obj = {"poly": rot.reshape(8), "name": "x", "difficult": 0}
    out = clip_objects_to_window([obj], 0, 0, 100, thresh=0.5)
    assert len(out) == 1
    assert out[0]["poly"].shape == (8,)


def test_split_image_shapes_and_names():
    img = np.zeros((1500, 1300, 3), np.uint8)
    chips = list(split_image(img, [], "P0001", subsize=1024, gap=200))
    names = [c[0] for c in chips]
    assert all(c[1].shape == (1024, 1024, 3) for c in chips)
    assert "P0001__1.0__0___0" in names
    # coverage includes the forced right/bottom windows
    assert any(n.endswith("___476") for n in names)


def test_parse_dota_label(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text(
        "imagesource:GoogleEarth\ngsd:0.5\n"
        "10 10 50 10 50 30 10 30 ship 0\n"
        "1 1 2 1 2 2 1 2 plane 1\n"
    )
    objs = parse_dota_label(p)
    assert len(objs) == 2
    assert objs[0]["name"] == "ship" and objs[1]["difficult"] == 1


# ------------------------------------------------------------------- merge
def test_parse_chip_name():
    assert parse_chip_name("P0001__1.0__824___412") == ("P0001", 1.0, 824.0, 412.0)
    assert parse_chip_name("P00_1__0.5__0___0") == ("P00_1", 0.5, 0.0, 0.0)


def test_chip_to_image_coords_rate():
    polys = np.array([[0, 0, 10, 0, 10, 10, 0, 10]], float)
    out = chip_to_image_coords(polys, "img__0.5__100___200")
    np.testing.assert_allclose(out[0][:2], [(0 + 100) / 0.5, (0 + 200) / 0.5])


def test_poly_nms():
    polys = np.array(
        [
            [0, 0, 10, 0, 10, 10, 0, 10],
            [1, 1, 11, 1, 11, 11, 1, 11],    # heavy overlap with 0
            [50, 50, 60, 50, 60, 60, 50, 60],
        ],
        float,
    )
    keep = poly_nms_np(polys, np.array([0.9, 0.8, 0.7]), 0.5)
    assert sorted(keep) == [0, 2]


def test_merge_cross_chip_dedup():
    # same object seen in two overlapping chips -> merged to one detection
    poly_local_a = [900, 100, 960, 100, 960, 140, 900, 140]  # chip at 0,0
    poly_local_b = [76, 100, 136, 100, 136, 140, 76, 140]    # chip at 824,0
    merged = merge_chip_detections(
        {
            "P1__1.0__0___0": [(0, 0.9, poly_local_a)],
            "P1__1.0__824___0": [(0, 0.8, poly_local_b)],
        }
    )
    assert len(merged["P1"]) == 1
    cid, score, poly = merged["P1"][0]
    assert score == 0.9
    np.testing.assert_allclose(poly[:2], [900, 100])


# ---------------------------------------------------------------- voc eval
def test_voc_ap_known_values():
    rec = np.array([0.5])
    prec = np.array([1.0])
    # 11-pt: t in {0,...,0.5} has prec 1 => 6/11
    assert abs(voc_ap(rec, prec, True) - 6 / 11) < 1e-9
    assert abs(voc_ap(rec, prec, False) - 0.5) < 1e-9


def square(x, y, s=10):
    return np.array([x, y, x + s, y, x + s, y + s, x, y + s], float)


def test_voc_eval_perfect_detection():
    gt = {"img1": [(square(0, 0), False), (square(50, 50), False)]}
    dets = [("img1", 0.9, square(0, 0)), ("img1", 0.8, square(50, 50))]
    res = voc_eval_class(dets, gt)
    assert abs(res["ap"] - 1.0) < 1e-9
    assert res["npos"] == 2


def test_voc_eval_duplicate_is_fp():
    gt = {"img1": [(square(0, 0), False)]}
    dets = [("img1", 0.9, square(0, 0)), ("img1", 0.8, square(1, 1))]
    res = voc_eval_class(dets, gt)
    np.testing.assert_allclose(res["rec"], [1.0, 1.0])
    np.testing.assert_allclose(res["prec"], [1.0, 0.5])


def test_voc_eval_difficult_excluded():
    gt = {"img1": [(square(0, 0), True), (square(50, 50), False)]}
    dets = [("img1", 0.9, square(0, 0)), ("img1", 0.8, square(50, 50))]
    res = voc_eval_class(dets, gt)
    assert res["npos"] == 1
    assert abs(res["ap"] - 1.0) < 1e-9  # difficult match neither tp nor fp


def test_evaluate_detections_map():
    gt_by_class = {
        0: {"img1": [(square(0, 0), False)]},
        1: {"img1": [(square(30, 30), False)]},
    }
    dets_by_class = {
        0: [("img1", 0.9, square(0, 0))],
        1: [("img1", 0.5, square(90, 90))],  # miss
    }
    out = evaluate_detections(dets_by_class, gt_by_class, ["a", "b"])
    assert abs(out["map50"] - 0.5) < 1e-9


# ---------------------------------------------------------------- augment
def test_rot90_polys_roundtrip(rng):
    img = rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)
    polys = np.array([[5, 5, 20, 5, 20, 15, 5, 15]], float)
    out_img, out_polys = img, polys
    for _ in range(4):
        out_img, out_polys = A.rot90_image_and_polys(out_img, out_polys, 1)
    np.testing.assert_array_equal(out_img, img)
    np.testing.assert_allclose(out_polys, polys)


def test_rot90_geometry():
    img = np.zeros((40, 60, 3), np.uint8)
    polys = np.array([[0, 0, 10, 0, 10, 10, 0, 10]], float)
    out_img, out_polys = A.rot90_image_and_polys(img, polys, 1)
    assert out_img.shape[:2] == (60, 40)
    # CCW rotation maps (x=0..10, y=0..10) corner to bottom-left region
    assert out_polys[0, 1::2].max() <= 60


def test_letterbox_and_scale():
    img = np.full((100, 200, 3), 50, np.uint8)
    out, r, pad = A.letterbox(img, 256)
    assert out.shape[:2] == (256, 256)
    assert abs(r - 256 / 200) < 1e-9
    polys = A.scale_polys(np.array([[0, 0, 200, 0, 200, 100, 0, 100]], float), r, pad)
    assert polys[0, 0::2].max() <= 256
    assert polys[0, 1::2].min() >= 0


def test_fliplr_polys():
    polys = np.array([[10, 5, 30, 5, 30, 15, 10, 15]], float)
    out = A.fliplr_polys(100, polys)
    np.testing.assert_allclose(out[0, 0::2], [90, 70, 70, 90])
    np.testing.assert_allclose(out[0, 1::2], polys[0, 1::2])


def test_mosaic4_and_mixup(rng):
    imgs = [rng.integers(0, 255, (64, 64, 3)).astype(np.uint8) for _ in range(4)]
    polys = [np.array([[10, 10, 30, 10, 30, 20, 10, 20]], float)] * 4
    cls = [np.array([i], np.int32) for i in range(4)]
    canvas, out_polys, out_cls = A.mosaic4(
        list(zip(imgs, polys, cls)), 64, rng=np.random.default_rng(0))
    assert canvas.shape == (128, 128, 3)
    assert len(out_polys) == len(out_cls) <= 4
    assert (out_polys[:, 0::2] >= -64).all() and (out_polys[:, 0::2] < 192).all()

    m_img, m_polys, m_cls = A.mixup(
        imgs[0], polys[0], cls[0], imgs[1], polys[1], cls[1],
        np.random.default_rng(0))
    assert m_img.shape == imgs[0].shape
    assert len(m_polys) == 2 and len(m_cls) == 2


def test_random_perspective_scale(rng):
    img = np.full((64, 64, 3), 100, np.uint8)
    polys = np.array([[16, 16, 48, 16, 48, 32, 16, 32]], float)
    out_img, out_polys = A.random_perspective_rotation(
        img, polys, degrees=0.0, translate=0.0, scale=0.3,
        rng=np.random.default_rng(1))
    assert out_img.shape == img.shape
    # box stays centered around image center under pure scaling about center
    c_in = polys.reshape(4, 2).mean(0)
    c_out = out_polys.reshape(4, 2).mean(0)
    d_in = np.abs(c_in - 32).max()
    d_out = np.abs(c_out - 32).max()
    assert d_out <= d_in * 1.4 + 1e-6


def test_dataset_mosaic_smoke(tmp_path, rng):
    import cv2
    from s2anet_tpu.data.dota import DotaDataset

    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir(); lbl_dir.mkdir()
    for i in range(4):
        cv2.imwrite(str(img_dir / f"im{i}.png"),
                    rng.integers(0, 255, (96, 96, 3)).astype(np.uint8))
        (lbl_dir / f"im{i}.txt").write_text(
            "1 0.2 0.2 0.6 0.2 0.6 0.4 0.2 0.4\n")
    ds = DotaDataset(img_dir, img_size=96, max_gt=8, augment=True,
                     mosaic=1.0, mixup=1.0, translate=0.1, scale=0.2)
    s = ds.get_sample(0, np.random.default_rng(0))
    assert s["imgs"].shape == (96, 96, 3)
    assert s["gt_boxes"].shape == (8, 5)


def test_eval_runner_gt_glue(tmp_path, rng):
    """gt_from_yolo_labels + detections_to_polys round trip: feeding the gt
    back as detections must score a perfect mAP through the runner's glue."""
    import cv2

    from s2anet_tpu.data.dota import DotaDataset
    from s2anet_tpu.eval.runner import detections_to_polys, gt_from_yolo_labels
    from s2anet_tpu.eval.voc_eval import evaluate_detections
    from s2anet_tpu.ops.polyiou_ref import rbox_vertices_np

    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir(); lbl_dir.mkdir()
    for i in range(3):
        cv2.imwrite(str(img_dir / f"im{i}.png"),
                    rng.integers(0, 255, (128, 128, 3)).astype(np.uint8))
        (lbl_dir / f"im{i}.txt").write_text(
            f"{i % 2} 0.2 0.2 0.6 0.2 0.6 0.4 0.2 0.4\n")
    ds = DotaDataset(img_dir, img_size=128, max_gt=8, augment=False)
    gt_by_class = gt_from_yolo_labels(ds, num_classes=2)
    assert sum(len(v) for v in gt_by_class[0].values()) == 2  # im0, im2
    assert sum(len(v) for v in gt_by_class[1].values()) == 1

    dets_by_class = {0: [], 1: []}
    for cid, per_img in gt_by_class.items():
        for img, objs in per_img.items():
            for poly, _ in objs:
                dets_by_class[cid].append((img, 0.9, poly))
    res = evaluate_detections(dets_by_class, gt_by_class, ["a", "b"])
    assert abs(res["map50"] - 1.0) < 1e-9

    # detections_to_polys: box+mask -> polygons/scores
    det_boxes = np.zeros((5, 6))
    det_boxes[0] = [50, 50, 30, 10, 0.4, 0.8]
    det_valid = np.zeros(5, bool)
    det_valid[0] = True
    polys, scores = detections_to_polys(det_boxes, det_valid)
    assert polys.shape == (1, 8) and scores[0] == 0.8
    np.testing.assert_allclose(
        polys[0], rbox_vertices_np(det_boxes[:1, :5]).reshape(8))


def test_unletterbox_rboxes_roundtrip():
    from s2anet_tpu.data.augment import letterbox, unletterbox_rboxes

    img = np.zeros((100, 200, 3), np.uint8)
    out, r, pad = letterbox(img, 256)
    # a box at original (100, 50), size (40, 20): letterbox then invert
    orig = np.array([[100, 50, 40, 20, 0.3]])
    boxed = orig.copy()
    boxed[:, 0] = orig[:, 0] * r + pad[0]
    boxed[:, 1] = orig[:, 1] * r + pad[1]
    boxed[:, 2:4] = orig[:, 2:4] * r
    back = unletterbox_rboxes(boxed, r, pad, (100, 200))
    np.testing.assert_allclose(back, orig, atol=1e-9)
