#!/usr/bin/env python
"""Export the detector to a serialized StableHLO artifact for serving.

TPU-native serving path: ``jax.export`` traces the full inference function
(backbone + FPN + head + decode + multiclass rotated NMS) into StableHLO
with the trained weights baked in as constants, and serializes it to one
portable file. The artifact reloads WITHOUT this package's model code
(``jax.export.deserialize(...).call(imgs)``) and compiles for any JAX
backend — the analogue of the reference's torch.jit/ONNX story, but in the
compiler IR the TPU toolchain actually consumes.

Usage:
  python tools/export.py --weights runs/train/exp/weights/deploy \
      --out s2anet_r50.stablehlo --batch-size 8 --img-size 1024

Reload:
  from jax import export
  exp = export.deserialize(open("s2anet_r50.stablehlo", "rb").read())
  det_boxes, det_labels, det_valid = exp.call(imgs)   # [B,K,6],[B,K],[B,K]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="")
    p.add_argument("--weights", default="",
                   help="checkpoint dir (train-state or deploy); empty = "
                        "random init (smoke use only)")
    # config-mirroring flags default to None so an untyped flag never stomps
    # a --config value (utils.config.prune_overrides)
    p.add_argument("--backbone", default=None)
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--img-size", type=int, default=None)
    p.add_argument("--dtype", default=None,
                   choices=["bfloat16", "float32"])
    p.add_argument("--no-ema", action="store_true")
    p.add_argument("--out", default="s2anet.stablehlo")
    return p.parse_args()


def build_inference_fn(cfg, use_ema: bool = True, weights: str = ""):
    """Returns (fn(imgs) -> (det_boxes, det_labels, det_valid), example)."""
    import jax
    import jax.numpy as jnp

    from s2anet_tpu.models.detector import S2ANet
    from s2anet_tpu.models.head import s2anet_get_bboxes

    model = S2ANet(
        backbone_name=cfg.model.backbone,
        num_classes=cfg.model.num_classes,
        strides=tuple(cfg.model.strides),
        with_orconv=cfg.model.with_orconv,
        deform_impl=cfg.model.deform_impl,
        align_offset_clamp=cfg.model.align_offset_clamp,
    )
    s = cfg.data.img_size
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, s, s, 3), jnp.float32),
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if weights:
        from s2anet_tpu.train.checkpoint import load_checkpoint, load_deploy
        from s2anet_tpu.train.optim import build_optimizer
        from s2anet_tpu.train.state import create_train_state

        try:
            tx = build_optimizer(lambda _: 0.0, params_example=params)
            state = load_checkpoint(
                weights, create_train_state(params, batch_stats, tx)
            )
            params = state.ema_params if use_ema else state.params
            batch_stats = (state.ema_batch_stats if use_ema
                           else state.batch_stats)
        except Exception:
            deploy = load_deploy(
                weights, {"params": params, "batch_stats": batch_stats}
            )
            params, batch_stats = deploy["params"], deploy["batch_stats"]

    dtype = (jnp.bfloat16 if cfg.train.dtype == "bfloat16" else jnp.float32)
    post_kwargs = dict(
        score_thr=cfg.model.score_thr,
        iou_thr=cfg.model.nms_iou_thr,
        max_before_nms_per_level=cfg.model.max_before_nms_per_level,
        max_per_img=cfg.model.max_per_img,
        pre_nms_cap=cfg.model.pre_nms_cap,
    )

    def infer(imgs):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs.astype(dtype), train=False,
        )
        return s2anet_get_bboxes(out, **post_kwargs)

    return infer


def main(opt):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from s2anet_tpu.utils.config import load_config, prune_overrides
    from s2anet_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    overrides = prune_overrides({
        "model": {"backbone": opt.backbone, "num_classes": opt.num_classes},
        "data": {"img_size": opt.img_size},
        "train": {"dtype": opt.dtype},
    })
    cfg = load_config(opt.config or None, overrides)
    opt.img_size = cfg.data.img_size
    infer = build_inference_fn(cfg, use_ema=not opt.no_ema,
                               weights=opt.weights)
    spec = jax.ShapeDtypeStruct(
        (opt.batch_size, opt.img_size, opt.img_size, 3), jnp.float32
    )
    exp = jexport.export(jax.jit(infer))(spec)
    data = exp.serialize()
    Path(opt.out).write_bytes(data)
    print(f"exported {opt.out}: {len(data) / 1e6:.1f} MB, "
          f"in {spec.shape} f32 -> {[str(o) for o in exp.out_avals]}")


if __name__ == "__main__":
    main(parse_opt())
