#!/usr/bin/env python
"""Detect oriented objects on arbitrary (full-size) images.

The missing end-user surface between `val.py` (labelled chips) and
`tools/visualize.py` (chips again): point it at any image or directory —
any resolution — and get merged full-image detections out. Covers the
reference's full-image flow (DOTA_devkit ImgSplit -> test -> ResultMerge,
/root/reference/DOTA_devkit/ImgSplit_multi_process.py + ResultMerge.py) as
ONE command, two execution modes:

  --mode chips    (default) tile the image into img-size chips with overlap
                  `--gap`, run the batched jit eval step, shift detections
                  back and merge with cross-chip polygon NMS — the
                  reference's protocol, any image size, bounded memory.
  --mode spatial  whole image in one jit program with its HEIGHT sharded
                  across the device mesh (conv halos + decode/NMS
                  collectives inserted by the SPMD partitioner) — no tiling
                  seams, no double-detection merge; pads to stride-128
                  multiples.

Outputs per image: ``<save_dir>/<name>.txt`` with one
``class_name score x1 y1 x2 y2 x3 y3 x4 y4`` line per detection (DOTA
submission geometry), plus ``<name>.jpg`` with drawn boxes when
``--save-img``. Also writes per-class ``Task1_<class>.txt`` files across
the whole run (DOTA submission format; for axis-aligned Task2 evaluation
use ``val.py --task 2``).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".webp"}


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--source", required=True, help="image file or directory")
    p.add_argument("--weights", default="", help="checkpoint dir (train-state or deploy)")
    p.add_argument("--config", default="")
    p.add_argument("--mode", choices=["chips", "spatial"], default="chips")
    # config-mirroring flags default to None so an untyped flag never stomps
    # a --config value (utils.config.prune_overrides); --conf falls back to
    # predict's own 0.3 (not eval's 0.05) when neither CLI nor config sets it
    p.add_argument("--backbone", default=None)
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--img-size", type=int, default=None, help="chip size (chips mode)")
    p.add_argument("--gap", type=int, default=200, help="chip overlap (chips mode)")
    p.add_argument("--batch-size", type=int, default=4, help="chips per dispatch")
    p.add_argument("--conf", type=float, default=None)
    p.add_argument("--iou-thres", type=float, default=None,
                   help="NMS threshold (also cross-chip merge NMS)")
    p.add_argument("--names", default="",
                   help="class preset: dota | dota-v1.5 | dota-v2.0 | hrsc")
    p.add_argument("--save-dir", default="runs/predict")
    p.add_argument("--save-img", action="store_true", help="write drawn images")
    p.add_argument("--no-ema", action="store_true")
    return p.parse_args()


def _list_images(source: str):
    src = Path(source)
    if src.is_file():
        return [src]
    imgs = sorted(
        p for p in src.iterdir() if p.suffix.lower() in IMG_EXTS
    )
    if not imgs:
        raise SystemExit(f"no images found under {src}")
    return imgs


def _load_state(model, cfg, weights, img_size):
    """Mirror val.py's loader: full train-state or deploy checkpoint."""
    import jax
    import jax.numpy as jnp

    from s2anet_tpu.train.checkpoint import load_checkpoint, load_deploy
    from s2anet_tpu.train.optim import build_optimizer
    from s2anet_tpu.train.state import create_train_state

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img_size, img_size, 3)),
        train=False,
    )
    tx = build_optimizer(lambda _: 0.0, params_example=variables["params"])
    state = create_train_state(
        variables["params"], variables.get("batch_stats", {}), tx
    )
    if weights:
        try:
            state = load_checkpoint(weights, jax.device_get(state))
        except Exception:
            deploy = load_deploy(
                weights,
                {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})},
            )
            state = state.replace(
                params=deploy["params"], batch_stats=deploy["batch_stats"],
                ema_params=deploy["params"],
                ema_batch_stats=deploy["batch_stats"],
            )
    return state


def _predict_chips(model, state, cfg, img_bgr, name, opt, eval_step):
    """Reference protocol: tile -> batched jit inference -> shift + poly NMS."""
    import numpy as np

    from s2anet_tpu.data.merge import merge_chip_detections
    from s2anet_tpu.data.split import split_image
    from s2anet_tpu.eval.runner import detections_to_polys

    chips = list(split_image(
        img_bgr, [], name, subsize=opt.img_size, gap=opt.gap,
    ))
    chip_dets = {}
    bs = opt.batch_size
    for i in range(0, len(chips), bs):
        group = chips[i:i + bs]
        imgs = np.stack(
            [c[1][:, :, ::-1].astype(np.float32) / 255.0 for c in group]
        )
        if len(group) < bs:  # pad to the static batch
            imgs = np.concatenate(
                [imgs, np.zeros((bs - len(group),) + imgs.shape[1:],
                                np.float32)], 0)
        det_boxes, det_labels, det_valid = eval_step(state, imgs)
        det_boxes = np.asarray(det_boxes)
        det_labels = np.asarray(det_labels)
        det_valid = np.asarray(det_valid)
        for k, (chip_name, _, _) in enumerate(group):
            polys, scores = detections_to_polys(det_boxes[k], det_valid[k])
            labels = det_labels[k][det_valid[k]]
            chip_dets[chip_name] = [
                (int(c), float(s), p)
                for c, s, p in zip(labels, scores, polys)
            ]
    merged = merge_chip_detections(chip_dets, opt.iou_thres)
    return merged.get(name, [])


def _predict_spatial(model, state, cfg, img_bgr, opt, cache):
    """Whole image, height sharded over the mesh — no tiling seams."""
    import jax
    import numpy as np

    from s2anet_tpu.eval.runner import detections_to_polys
    from s2anet_tpu.parallel.mesh import make_mesh
    from s2anet_tpu.parallel.spatial import make_spatial_eval_step, shard_image

    if "mesh" not in cache:  # built once, reused across the image loop
        cache["mesh"] = make_mesh()
        cache["step"], _ = make_spatial_eval_step(
            model, mesh=cache["mesh"], model_cfg=cfg.model,
        )
        cache["vars"] = {
            "params": jax.device_get(
                state.ema_params if not opt.no_ema else state.params),
            "batch_stats": jax.device_get(
                state.ema_batch_stats if not opt.no_ema
                else state.batch_stats),
        }
    mesh = cache["mesh"]
    n = mesh.devices.size
    h0, w0 = img_bgr.shape[:2]
    unit = 128 * n
    hp = -(-h0 // unit) * unit
    wp = -(-w0 // 128) * 128
    rgb = np.zeros((1, hp, wp, 3), np.float32)
    rgb[0, :h0, :w0] = img_bgr[:, :, ::-1].astype(np.float32) / 255.0

    # ONE jitted step; jax caches a compiled program per padded (hp, wp)
    det_boxes, det_labels, det_valid = cache["step"](
        cache["vars"], shard_image(mesh, rgb),
    )
    det_boxes = np.asarray(det_boxes)[0]
    det_valid = np.asarray(det_valid)[0]
    labels = np.asarray(det_labels)[0][det_valid]
    polys, scores = detections_to_polys(det_boxes, det_valid)
    return [(int(c), float(s), p) for c, s, p in zip(labels, scores, polys)]


def main(opt):
    from s2anet_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    import cv2
    import numpy as np

    from s2anet_tpu.data.split import DOTA_CLASSES
    from s2anet_tpu.eval.runner import save_dota_results
    from s2anet_tpu.models.detector import S2ANet
    from s2anet_tpu.parallel.step import make_eval_step
    from s2anet_tpu.utils.config import (NAMES_PRESETS, load_config,
                                         prune_overrides)

    overrides = prune_overrides({
        "model": {
            "backbone": opt.backbone,
            "num_classes": opt.num_classes,
            "nms_iou_thr": opt.iou_thres,
        },
        "data": {"img_size": opt.img_size,
                 **({"names": opt.names} if opt.names else {})},
    })
    cfg = load_config(opt.config or None, overrides)
    # predict's threshold is its OWN config key (model.predict_score_thr,
    # default 0.3): the eval protocol's score_thr (0.05 in the shipped
    # configs) must never set the drawing/saving threshold. Precedence:
    # --conf > config's predict_score_thr > 0.3.
    import dataclasses as _dc

    thr = (opt.conf if opt.conf is not None
           else getattr(cfg.model, "predict_score_thr", 0.3))
    cfg = _dc.replace(cfg, model=_dc.replace(cfg.model, score_thr=thr))
    opt.img_size = cfg.data.img_size
    opt.iou_thres = cfg.model.nms_iou_thr
    # the chip slide is img_size - gap and must stay positive (the reference
    # devkit assumes gap < subsize too, ImgSplit gap=200 vs subsize=1024)
    opt.gap = min(opt.gap, opt.img_size // 2)
    names = NAMES_PRESETS.get(opt.names.lower(), DOTA_CLASSES)
    if len(names) != cfg.model.num_classes:
        names = [str(i) for i in range(cfg.model.num_classes)]

    model = S2ANet(
        backbone_name=cfg.model.backbone,
        num_classes=cfg.model.num_classes,
        strides=tuple(cfg.model.strides),
        deform_impl=cfg.model.deform_impl,
        align_offset_clamp=cfg.model.align_offset_clamp,
    )
    state = _load_state(model, cfg, opt.weights, opt.img_size)
    if getattr(cfg.model, "fold_bn", True):
        # serving-time conv+BN weight folding (models/fold.py; reference
        # fuse_conv_and_bn parity) — predict.py is always standalone serving
        import jax

        from s2anet_tpu.models.fold import fold_bn_for_eval

        sel_p = state.ema_params if not opt.no_ema else state.params
        sel_b = (state.ema_batch_stats if not opt.no_ema
                 else state.batch_stats)
        model, folded = fold_bn_for_eval(
            model, jax.device_get({"params": sel_p, "batch_stats": sel_b}))
        state = state.replace(
            params=folded["params"], ema_params=folded["params"],
            batch_stats=folded["batch_stats"],
            ema_batch_stats=folded["batch_stats"],
        )

    save_dir = Path(opt.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    eval_step = None
    if opt.mode == "chips":
        eval_step = make_eval_step(
            model, model_cfg=cfg.model, use_ema=not opt.no_ema,
        )
    spatial_cache: dict = {}

    all_dets = []  # (image_name, class_id, score, poly)
    n_processed = 0
    for path in _list_images(opt.source):
        img = cv2.imread(str(path))
        if img is None:
            print(f"skipping unreadable image {path}")
            continue
        n_processed += 1
        name = path.stem
        if opt.mode == "chips":
            dets = _predict_chips(model, state, cfg, img, name, opt, eval_step)
        else:
            dets = _predict_spatial(model, state, cfg, img, opt, spatial_cache)
        lines = []
        for cid, score, poly in dets:
            all_dets.append((name, cid, score, poly))
            coords = " ".join(f"{v:.2f}" for v in np.asarray(poly).reshape(8))
            lines.append(f"{names[cid]} {score:.4f} {coords}")
        (save_dir / f"{name}.txt").write_text("\n".join(lines) + "\n")
        if opt.save_img:
            from s2anet_tpu.ops.rbox import poly_to_rbox_np
            from s2anet_tpu.utils.plots import draw_rboxes

            if dets:
                polys = np.stack([np.asarray(p).reshape(8) for _, _, p in dets])
                rb = poly_to_rbox_np(polys)
                drawn = draw_rboxes(
                    img, rb,
                    classes=[c for c, _, _ in dets],
                    scores=[s for _, s, _ in dets], names=names,
                )
            else:
                drawn = img
            cv2.imwrite(str(save_dir / f"{name}.jpg"), drawn)
        print(f"{name}: {len(dets)} detections")

    by_class: dict = {}
    for img_name, cid, score, poly in all_dets:
        by_class.setdefault(cid, []).append((img_name, score, poly))
    save_dota_results(by_class, names, save_dir / "dota_submission")
    print(json.dumps({
        "images": n_processed,
        "detections": len(all_dets),
        "save_dir": str(save_dir),
    }))


if __name__ == "__main__":
    main(parse_opt())
