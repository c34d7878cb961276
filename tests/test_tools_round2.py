"""Round-2 tooling tests: HRSC->YOLO converter, StableHLO export, run-dir
incrementing."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


# ------------------------------------------------------------- increment_path
def test_increment_path(tmp_path):
    from s2anet_tpu.train.checkpoint import increment_path

    p = tmp_path / "exp"
    assert increment_path(p) == str(p)          # unused -> as-is
    p.mkdir()
    assert increment_path(p) == str(tmp_path / "exp2")
    (tmp_path / "exp2").mkdir()
    assert increment_path(p) == str(tmp_path / "exp3")
    assert increment_path(p, exist_ok=True) == str(p)


# --------------------------------------------------------------- HRSC convert
def _write_hrsc_xml(path, objs, w=800, h=600):
    rows = []
    for cx, cy, bw, bh, ang, diff in objs:
        rows.append(
            f"<HRSC_Object><difficult>{diff}</difficult>"
            f"<mbox_cx>{cx}</mbox_cx><mbox_cy>{cy}</mbox_cy>"
            f"<mbox_w>{bw}</mbox_w><mbox_h>{bh}</mbox_h>"
            f"<mbox_ang>{ang}</mbox_ang></HRSC_Object>"
        )
    path.write_text(
        "<HRSC_Image>"
        f"<Img_SizeWidth>{w}</Img_SizeWidth>"
        f"<Img_SizeHeight>{h}</Img_SizeHeight>"
        f"<HRSC_Objects>{''.join(rows)}</HRSC_Objects>"
        "</HRSC_Image>"
    )


def test_hrsc_converter_roundtrip(tmp_path):
    import cv2

    root = tmp_path / "hrsc"
    (root / "AllImages").mkdir(parents=True)
    (root / "Annotations").mkdir()
    (root / "ImageSets").mkdir()
    cv2.imwrite(str(root / "AllImages" / "100000001.png"),
                np.zeros((600, 800, 3), np.uint8))
    _write_hrsc_xml(root / "Annotations" / "100000001.xml",
                    [(400, 300, 200, 80, 0.3, 0),     # kept
                     (100, 100, 50, 20, -0.5, 1)])    # difficult -> dropped
    (root / "ImageSets" / "trainval.txt").write_text("100000001\n")

    out = tmp_path / "yolo"
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "convert_hrsc_to_yolo.py"),
         "--hrsc-root", str(root), "--out", str(out), "--copy-images"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    label = (out / "labels" / "100000001.txt").read_text().strip().splitlines()
    assert len(label) == 1                       # difficult filtered
    vals = np.array([float(v) for v in label[0].split()])
    assert vals[0] == 0                          # single 'ship' class
    poly = vals[1:].reshape(4, 2) * [800, 600]
    # center and side lengths of the converted polygon match the mbox
    np.testing.assert_allclose(poly.mean(0), [400, 300], atol=1e-3)
    sides = sorted([np.linalg.norm(poly[1] - poly[0]),
                    np.linalg.norm(poly[2] - poly[1])])
    np.testing.assert_allclose(sides, [80, 200], atol=1e-2)
    assert (out / "train.txt").read_text().strip().endswith("100000001.png")

    # the converted layout loads straight into the training dataset
    from s2anet_tpu.data.dota import DotaDataset

    ds = DotaDataset(out / "images", img_size=128, max_gt=8, augment=False)
    sample = ds.get_sample(0)
    assert sample["gt_mask"].sum() == 1
    assert np.isfinite(sample["gt_boxes"]).all()


# ------------------------------------------------------------ StableHLO export
@pytest.mark.slow
def test_export_stablehlo_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    sys.path.insert(0, str(REPO / "tools"))
    from export import build_inference_fn  # noqa: E402

    from s2anet_tpu.utils.config import load_config

    cfg = load_config(None, {
        "model": {"backbone": "resnet18", "num_classes": 2,
                  "max_per_img": 16, "pre_nms_cap": 64,
                  "max_before_nms_per_level": 32},
        "data": {"img_size": 64},
        "train": {"dtype": "float32"},
    })
    infer = build_inference_fn(cfg, weights="")
    spec = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    exp = jexport.export(jax.jit(infer))(spec)
    data = exp.serialize()
    assert len(data) > 1_000_000                 # weights baked in

    back = jexport.deserialize(data)
    imgs = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 64, 64, 3)), jnp.float32)
    det_boxes, det_labels, det_valid = back.call(imgs)
    ref_boxes, ref_labels, ref_valid = jax.jit(infer)(imgs)
    np.testing.assert_allclose(np.asarray(det_boxes), np.asarray(ref_boxes),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(det_valid),
                                  np.asarray(ref_valid))
