"""Evaluation driver — the reference val.py re-built as a streaming pipeline.

Parity (/root/reference/val.py:113-425):
  * batched jit inference (forward + decode + NMS fully on device; only the
    fixed-size detection buffers cross to host, vs the reference's per-image
    python lists at val.py:278-282);
  * detections become polygons and are either
      - evaluated directly against split-chip ground truth
        (``is_mAP_split=True``, val.py:298-311), or
      - merged back to full images with cross-chip polygon NMS first
        (val.py:315-318);
  * per-class VOC-07 AP at IoU 0.5, difficult GT filtered; max-F1 P/R.
"""

from __future__ import annotations

import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from ..data.dota import BatchLoader, DotaDataset
from ..data.merge import merge_chip_detections
from ..data.split import parse_dota_label
from ..ops.polyiou_ref import rbox_vertices_np
from ..parallel.step import make_eval_step
from .voc_eval import evaluate_detections


def detections_to_polys(det_boxes: np.ndarray, det_valid: np.ndarray):
    """[K, 6] (x,y,w,h,theta,score) + mask -> ([n,8] polys, [n] scores)."""
    boxes = det_boxes[det_valid]
    if len(boxes) == 0:
        return np.zeros((0, 8)), np.zeros((0,))
    polys = rbox_vertices_np(boxes[:, :5]).reshape(-1, 8)
    return polys, boxes[:, 5]


def gt_from_yolo_labels(dataset: DotaDataset, num_classes: int,
                        dims: Optional[Dict[str, tuple]] = None):
    """Chip-level GT from the dataset's YOLO labels, in ORIGINAL image coords
    (labels are normalized by the original dims; detections are un-letterboxed
    back to the same frame before matching).

    ``dims`` maps image stem -> (h0, w0) when the caller already knows the
    original dims (the eval loop records them from the loader), avoiding a
    per-image header read every epoch.
    """
    gt_by_class: Dict[int, Dict] = {c: {} for c in range(num_classes)}
    size = dataset.img_size
    for img_path, label in zip(dataset.img_files, dataset.labels):
        img_name = Path(img_path).stem
        w0 = h0 = size
        if len(label):
            if dims is not None and img_name in dims:
                h0, w0 = dims[img_name]
            else:
                try:  # header-only read of the original dims
                    from PIL import Image

                    with Image.open(img_path) as im:
                        w0, h0 = im.size
                except Exception:
                    pass
        for c in range(num_classes):
            gt_by_class[c].setdefault(img_name, [])
        for row in label:
            cid = int(row[0])
            poly = row[1:].copy()
            poly[0::2] *= w0
            poly[1::2] *= h0
            gt_by_class[cid][img_name].append((poly.astype(np.float64), False))
    return gt_by_class


def gt_from_dota_dir(gt_dir, class_names, image_names=None):
    """Full-image GT from DOTA labelTxt files (difficult respected)."""
    name_to_id = {n: i for i, n in enumerate(class_names)}
    gt_by_class: Dict[int, Dict] = {c: {} for c in range(len(class_names))}
    paths = sorted(Path(gt_dir).glob("*.txt"))
    for p in paths:
        img = p.stem
        if image_names is not None and img not in image_names:
            continue
        for c in range(len(class_names)):
            gt_by_class[c].setdefault(img, [])
        for obj in parse_dota_label(p):
            cid = name_to_id.get(obj["name"])
            if cid is None:
                continue
            gt_by_class[cid][img].append(
                (np.asarray(obj["poly"], np.float64), bool(obj["difficult"]))
            )
    return gt_by_class


def save_dota_results(dets_by_class, class_names, out_dir):
    """Dump detections in the DOTA submission format: one
    ``Task1_<classname>.txt`` per class, lines ``imgname score x1 y1 ... y4``
    (val.py:32-57 ``save_per_class`` / :62-111 ``merge_per_class`` parity).
    Every class gets a file (empty when no detections) so the directory is a
    complete DOTA-server submission."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for cid, cname in enumerate(class_names):
        lines = []
        for img, score, poly in dets_by_class.get(cid, []):
            coords = " ".join(f"{v:.2f}" for v in np.asarray(poly).ravel()[:8])
            lines.append(f"{img} {score:.6f} {coords}")
        (out_dir / f"Task1_{cname}.txt").write_text(
            "\n".join(lines) + ("\n" if lines else "")
        )
    return out_dir


def evaluate_on_chips(model, state, cfg, mesh=None, dataset=None,
                      use_ema: bool = True, verbose: bool = False,
                      eval_step=None, with_loss: bool = False,
                      save_dir=None):
    """Run inference over the val chips and compute mAP50.

    Returns dict(map50, mp, mr, per_class, timing; plus ``val/*_loss`` items
    when ``with_loss``). Pass a pre-built ``eval_step`` (from
    :func:`make_eval_step`, matching ``with_loss``) to reuse the compiled
    program across epochs. ``save_dir`` dumps per-class DOTA-format result
    txts (chip-level, and merged when ``is_map_split=False``)."""
    import jax.numpy as jnp

    if getattr(cfg.model, "quant", "none") == "int8":
        # validate the scope knob up front — a typo'd group must fail loudly
        # before any loader/compile work, not silently run float
        from ..ops.quant import QUANT_SCOPE_ALL, QUANT_SCOPE_DEFAULT

        scope = tuple(getattr(cfg.model, "quant_scope", QUANT_SCOPE_DEFAULT))
        unknown = set(scope) - set(QUANT_SCOPE_ALL)
        if unknown:
            raise ValueError(
                f"unknown quant_scope groups {sorted(unknown)}; "
                f"valid: {QUANT_SCOPE_ALL}")

    dataset = dataset or DotaDataset(
        cfg.data.val_list or cfg.data.root,
        img_size=cfg.data.img_size,
        max_gt=cfg.data.max_gt,
        augment=False,
        class_names=cfg.data.names,
    )
    rect = bool(getattr(cfg.eval, "rect", False))
    assert not (rect and with_loss), (
        "rect eval computes no val losses (loss needs one static imgs_size)"
    )
    loader = BatchLoader(
        dataset, cfg.eval.batch_size, shuffle=False, drop_last=False,
        num_workers=cfg.data.workers or None, mode=cfg.data.loader,
        rect=rect, rect_stride=getattr(cfg.eval, "rect_stride", 32),
    )
    dtype = jnp.bfloat16 if cfg.train.dtype == "bfloat16" else jnp.float32
    quant_vars = None
    if (eval_step is not None
            and getattr(cfg.model, "quant", "none") == "int8"
            and getattr(model, "quant", "none") == "none"):
        import warnings

        warnings.warn(
            "cfg.model.quant='int8' is ignored: a pre-built (float) "
            "eval_step was passed; build the step through "
            "evaluate_on_chips(eval_step=None) to get the quantized program",
            stacklevel=2,
        )
    if eval_step is None and getattr(cfg.model, "fold_bn", True):
        # serving-time conv+BN weight folding (models/fold.py; reference
        # fuse_conv_and_bn parity): standalone inference only — the
        # trainer's per-epoch val passes a pre-built eval_step and keeps
        # live BN statistics
        from ..models.fold import fold_bn_for_eval

        params = state.ema_params if use_ema else state.params
        bstats = state.ema_batch_stats if use_ema else state.batch_stats
        model, folded = fold_bn_for_eval(
            model, {"params": params, "batch_stats": bstats})
        state = state.replace(
            params=folded["params"], ema_params=folded["params"],
            batch_stats=folded["batch_stats"],
            ema_batch_stats=folded["batch_stats"],
        )
    if (eval_step is None
            and getattr(cfg.model, "quant", "none") == "int8"
            and getattr(model, "quant", "none") == "none"):
        # int8 PTQ: calibrate activation ranges on the first val batches
        # (square letterbox — one static shape), then run the quantized
        # model. Float stays the default; see ops/quant.py.
        import itertools

        from ..ops.quant import calibrate

        # per-module scope (config knob, validated above): set it on the
        # model BEFORE calibration so the calib clone records ranges for
        # exactly the convs the int8 program will quantize
        model = model.clone(quant_scope=scope)
        k = max(1, int(getattr(cfg.model, "quant_calib_batches", 4)))
        # a dedicated cheap loader: thread mode + 1 worker (spinning the
        # full process pool up for ~4 batches costs more than it saves,
        # and abandoning a process-mode generator mid-iteration leaves
        # worker/shm teardown to the GC); islice + close() makes the
        # early exit deterministic
        calib_loader = BatchLoader(
            dataset, cfg.eval.batch_size, shuffle=False, drop_last=False,
            num_workers=1, mode="thread",
        )
        stacks = []
        it = iter(calib_loader)
        try:
            for batch in itertools.islice(it, k):
                imgs = batch["imgs"]
                if imgs.shape[0] < cfg.eval.batch_size:  # wrap-pad partial
                    sel = (np.arange(cfg.eval.batch_size - imgs.shape[0])
                           % imgs.shape[0])
                    imgs = np.concatenate([imgs, imgs[sel]], 0)
                stacks.append(imgs)
        finally:
            if hasattr(it, "close"):
                it.close()
        calib = np.stack(stacks)  # [K, B, H, W, C]
        n_dev = mesh.devices.size if mesh is not None else 1
        if n_dev > 1 and calib.shape[1] % n_dev == 0:
            # calibrate() jits on ONE device: re-chunk the mesh-global
            # batches to per-device size so calibration fits wherever the
            # sharded eval fits (per-tensor min/max ranges are batch-size
            # independent; multi-process range reduction happens inside
            # calibrate())
            k_, b = calib.shape[:2]
            calib = calib.reshape((k_ * n_dev, b // n_dev) + calib.shape[2:])
        params = state.ema_params if use_ema else state.params
        bstats = state.ema_batch_stats if use_ema else state.batch_stats
        quant_vars = calibrate(
            model, {"params": params, "batch_stats": bstats},
            jnp.asarray(calib).astype(dtype),
        )
        model = model.clone(quant="int8")
    if eval_step is None:
        eval_step = make_eval_step(
            model, model_cfg=cfg.model, compute_dtype=dtype, mesh=mesh,
            use_ema=use_ema, with_loss=with_loss,
            imgs_size=(cfg.data.img_size, cfg.data.img_size),
            num_classes=cfg.model.num_classes,
            quant_vars=quant_vars,
        )

    num_classes = cfg.model.num_classes
    chip_dets: Dict[str, list] = {}
    chip_dims: Dict[str, tuple] = {}
    mean_loss = np.zeros(4)
    n_loss = 0
    n_imgs = 0

    def _consume(out, b, batch):
        """Fetch one dispatched batch's results and postprocess on the host.

        Called one iteration LATE (software pipeline): while the device runs
        batch i, the host fetches + postprocesses batch i-1 and the loader
        decodes batch i+1 — jax dispatch is async, so deferring the
        device_get by one step is all the overlap takes.
        """
        nonlocal n_loss, n_imgs
        if with_loss:
            det_boxes, det_labels, det_valid, loss_items = out
            # weight by the REAL image count b: the final partial batch is
            # zero-padded to the static batch size and its padded images
            # (no gt) would otherwise dilute val/*_loss with full weight
            mean_loss[:] += (
                np.asarray(jax.device_get(loss_items)) - mean_loss
            ) * (b / (n_loss + b))
            n_loss += b
        else:
            det_boxes, det_labels, det_valid = out
        det_boxes = np.asarray(jax.device_get(det_boxes))[:b]
        det_labels = np.asarray(jax.device_get(det_labels))[:b]
        det_valid = np.asarray(jax.device_get(det_valid))[:b]
        n_imgs += b
        for k in range(b):
            chip_name = Path(batch["paths"][k]).stem
            boxes_k = det_boxes[k].copy()
            h0, w0 = batch["orig_shapes"][k]
            th, tw = (batch["img_shapes"][k] if "img_shapes" in batch
                      else (dataset.img_size, dataset.img_size))
            if (h0, w0) != (th, tw):
                # undo the (possibly rect) letterbox: detections back to
                # original chip coords (scale_coords_rotated parity,
                # utils/general.py:629)
                from ..data.augment import unletterbox_rboxes

                ratio = min(th / h0, tw / w0)
                pad = ((tw - w0 * ratio) / 2, (th - h0 * ratio) / 2)
                # no center clipping: scale_coords_rotated leaves
                # out-of-frame detections as-is (general.py:647-648)
                boxes_k[:, :5] = unletterbox_rboxes(
                    boxes_k[:, :5], ratio, pad
                )
            dets = []
            polys, scores = detections_to_polys(boxes_k, det_valid[k])
            labels = det_labels[k][det_valid[k]]
            for cid, sc, poly in zip(labels, scores, polys):
                dets.append((int(cid), float(sc), poly))
            chip_dets[chip_name] = dets
            chip_dims[chip_name] = (h0, w0)

    t_wall0 = time.perf_counter()
    pending = None  # one-batch-deep pipeline: (dispatched out, b, batch)
    for batch in loader:
        imgs = batch["imgs"]
        b = imgs.shape[0]
        if b < cfg.eval.batch_size:  # pad to static batch
            # pad by WRAPPING the real images, not with zeros: blank padded
            # images would contribute background focal loss over all their
            # anchors (and the static batch size to the positives normalizer)
            # to the with_loss items — the b-weighted running mean cannot
            # undo contamination inside a batch's own mean. Replicated real
            # images keep the items a mean over real data (the duplicates
            # mildly re-weight within this one partial batch); detections
            # are sliced back to [:b] either way.
            pad = cfg.eval.batch_size - b
            sel = np.arange(pad) % b
            for key in ("imgs", "gt_boxes", "gt_classes", "gt_mask"):
                arr = batch[key]
                batch[key] = np.concatenate([arr, arr[sel]], 0)
            imgs = batch["imgs"]
        step_in = (
            {k: batch[k] for k in
             ("imgs", "gt_boxes", "gt_classes", "gt_mask")}
            if with_loss else imgs
        )
        if mesh is not None:
            from ..parallel.mesh import shard_batch

            step_in = shard_batch(mesh, step_in)
        out = eval_step(state, step_in)  # async dispatch
        if pending is not None:
            _consume(*pending)  # previous batch, while the device runs
        pending = (out, b, batch)
    if pending is not None:
        _consume(*pending)
    t_infer = time.perf_counter() - t_wall0

    if cfg.eval.is_map_split:
        # evaluate directly on chips against the dataset's own labels
        dets_by_class = defaultdict(list)
        for chip, dets in chip_dets.items():
            for cid, sc, poly in dets:
                dets_by_class[cid].append((chip, sc, poly))
        gt_by_class = gt_from_yolo_labels(dataset, num_classes, dims=chip_dims)
        if save_dir is not None:
            save_dota_results(dets_by_class, cfg.data.names,
                              Path(save_dir) / "chip_results")
    else:
        if save_dir is not None:
            chip_by_class = defaultdict(list)
            for chip, dets in chip_dets.items():
                for cid, sc, poly in dets:
                    chip_by_class[cid].append((chip, sc, poly))
            save_dota_results(chip_by_class, cfg.data.names,
                              Path(save_dir) / "chip_results")
        merged = merge_chip_detections(chip_dets, cfg.eval.merge_nms_thr)
        dets_by_class = defaultdict(list)
        for img, dets in merged.items():
            for cid, sc, poly in dets:
                dets_by_class[cid].append((img, sc, poly))
        gt_by_class = gt_from_dota_dir(cfg.data.val_gt_dir, cfg.data.names)
        if save_dir is not None:
            save_dota_results(dets_by_class, cfg.data.names,
                              Path(save_dir) / "merged_results")

    out = evaluate_detections(
        dict(dets_by_class), gt_by_class, cfg.data.names,
        ovthresh=cfg.eval.iou_thres, use_07_metric=cfg.eval.use_07_metric,
        task=getattr(cfg.eval, "task", 1),
    )
    # end-to-end wall rate over the pipelined loop (host decode, device
    # compute and result postprocess overlapped; includes first compile) —
    # the production serving figure, not the device-only rate (bench.py
    # measures that one, scan-differenced)
    out["images_per_sec"] = n_imgs / max(t_infer, 1e-9)
    out["n_images"] = n_imgs
    if with_loss and n_loss:
        for i, key in enumerate(
            ("val/fam_cls_loss", "val/fam_reg_loss",
             "val/odm_cls_loss", "val/odm_reg_loss")
        ):
            out[key] = float(mean_loss[i])
    if verbose:
        for cname, res in out["per_class"].items():
            print(f"{cname:20s} AP50 {res['ap']:.4f}")
        print(f"mAP50 {out['map50']:.4f}  ({out['images_per_sec']:.1f} img/s)")
    return out
