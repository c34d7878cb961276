#!/usr/bin/env python
"""Evaluate S2ANet-TPU on DOTA val chips (CLI parity with /root/reference/val.py).

Runs batched jit inference, then either chip-level mAP (--map-split, the
default like the reference) or cross-chip merge + full-image mAP.
"""

from __future__ import annotations

import argparse
import json


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="")
    p.add_argument("--weights", default="", help="checkpoint dir (train-state or deploy)")
    p.add_argument("--data-root", default="", help="val images dir or list txt")
    p.add_argument("--gt-dir", default="", help="full-image DOTA labelTxt dir (merge mode)")
    # config-mirroring flags default to None: an untyped flag never stomps a
    # --config value (utils.config.prune_overrides); the dataclass defaults
    # (resnet50 / 15 classes / 1024 / ...) apply when neither is given
    p.add_argument("--backbone", default=None)
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--img-size", type=int, default=None)
    p.add_argument("--conf-thres", type=float, default=None)
    p.add_argument("--iou-thres", type=float, default=None)
    p.add_argument("--no-map-split", action="store_true",
                   help="merge chips to full images before eval")
    p.add_argument("--no-ema", action="store_true")
    p.add_argument("--save-dir", default="",
                   help="dump per-class DOTA-format result txts + PR curves")
    p.add_argument("--task", type=int, default=None, choices=[1, 2],
                   help="1 = oriented boxes (Task1), 2 = horizontal (Task2)")
    p.add_argument("--names", default="",
                   help="class preset: dota | dota-v1.5 | dota-v2.0 | hrsc")
    p.add_argument("--rect", action="store_true",
                   help="shape-ordered rect batches (reference val.py:219 "
                        "rect=True pad=0.5) — faster on non-square datasets")
    p.add_argument("--quant", default=None, choices=["none", "int8"],
                   help="int8 post-training quantization for inference "
                        "(calibrates on the first val batches; ~2x conv "
                        "rate on the TPU MXU)")
    p.add_argument("--quant-scope", default=None,
                   help="comma-separated module groups to quantize "
                        "(backbone,neck,head_stacks,orconv,heads); "
                        "default = the measured throughput argmax")
    return p.parse_args()


def main(opt):
    import jax

    from s2anet_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    from s2anet_tpu.eval.runner import evaluate_on_chips
    from s2anet_tpu.models.detector import S2ANet
    from s2anet_tpu.train.checkpoint import load_checkpoint
    from s2anet_tpu.train.optim import build_optimizer
    from s2anet_tpu.train.state import create_train_state
    from s2anet_tpu.utils.config import load_config, prune_overrides
    import jax.numpy as jnp

    overrides = prune_overrides({
        "model": {
            "backbone": opt.backbone,
            "num_classes": opt.num_classes,
            "score_thr": opt.conf_thres,
            "nms_iou_thr": opt.iou_thres,
            "quant": opt.quant,
            "quant_scope": (tuple(
                s.strip() for s in opt.quant_scope.split(",") if s.strip()
            ) if opt.quant_scope else None),
        },
        "data": {"val_list": opt.data_root or None,
                 "root": opt.data_root or None,
                 "img_size": opt.img_size,
                 "val_gt_dir": opt.gt_dir or None,
                 **({"names": opt.names} if opt.names else {})},
        "eval": {"batch_size": opt.batch_size,
                 # store_true flags only override when actually typed
                 "is_map_split": False if opt.no_map_split else None,
                 "task": opt.task,
                 "rect": True if opt.rect else None},
    })
    cfg = load_config(opt.config or None, overrides)

    model = S2ANet(
        backbone_name=cfg.model.backbone,
        num_classes=cfg.model.num_classes,
        strides=tuple(cfg.model.strides),
        deform_impl=cfg.model.deform_impl,
        align_offset_clamp=cfg.model.align_offset_clamp,
    )
    s = cfg.data.img_size
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, s, s, 3)), train=False
    )
    tx = build_optimizer(lambda _: 0.0, params_example=variables["params"])
    state = create_train_state(
        variables["params"], variables.get("batch_stats", {}), tx
    )
    if opt.weights:
        try:
            state = load_checkpoint(opt.weights, jax.device_get(state))
        except Exception:
            # deploy checkpoint (params + batch_stats only, strip_for_deploy)
            from s2anet_tpu.train.checkpoint import load_deploy

            deploy = load_deploy(
                opt.weights,
                {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})},
            )
            state = state.replace(
                params=deploy["params"],
                batch_stats=deploy["batch_stats"],
                ema_params=deploy["params"],
                ema_batch_stats=deploy["batch_stats"],
            )

    out = evaluate_on_chips(model, state, cfg, use_ema=not opt.no_ema,
                            verbose=True,
                            save_dir=opt.save_dir or None)
    if opt.save_dir:
        from pathlib import Path

        from s2anet_tpu.utils.plots import plot_pr_curves

        plot_pr_curves(out["per_class"], Path(opt.save_dir) / "pr_curves.png")
    print(json.dumps({
        "map50": out["map50"], "precision": out["mp"], "recall": out["mr"],
        "images_per_sec": out["images_per_sec"],
    }))


if __name__ == "__main__":
    main(parse_opt())
