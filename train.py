#!/usr/bin/env python
"""Train S2ANet-TPU (CLI parity with /root/reference/train.py:471-542).

Examples:
  python train.py --data-root /data/dota_split/images --epochs 12 --batch-size 8
  python train.py --config configs/dota_r50.yaml --resume runs/train/exp/weights/last
"""

from __future__ import annotations

import argparse


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="", help="yaml config path")
    p.add_argument("--data-root", default="", help="train images dir or list txt")
    p.add_argument("--val-root", default="", help="val images dir or list txt")
    # config-mirroring flags default to None: an untyped flag never stomps a
    # --config value (utils.config.prune_overrides); the dataclass defaults
    # (resnet50 / 15 classes / 1024 / ...) apply when neither is given
    p.add_argument("--backbone", default=None)
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--img-size", type=int, default=None)
    p.add_argument("--lr0", type=float, default=None)
    p.add_argument("--lr-schedule", default=None,
                   choices=["step", "cosine", "linear"])
    p.add_argument("--dtype", default=None, choices=["bfloat16", "float32"])
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--save-dir", default=None)
    p.add_argument("--resume", default="", help="checkpoint dir to resume from")
    p.add_argument("--noval", action="store_true")
    p.add_argument("--pretrained", default=None,
                   help="torchvision ResNet state dict path, or 'auto' to "
                        "search the torch hub cache (ImageNet init)")
    p.add_argument("--nbs", type=int, default=None,
                   help="nominal batch size for gradient accumulation "
                        "(0 = off)")
    p.add_argument("--noplots", action="store_true")
    p.add_argument("--cache", default=None, choices=["", "ram", "disk", "packed"],
                   help="image cache mode (packed = one pre-decoded mmap shard)")
    p.add_argument("--workers", type=int, default=None,
                   help="loader workers (0 = auto)")
    p.add_argument("--loader", default=None, choices=["thread", "process"],
                   help="loader worker kind; process scales with host cores")
    p.add_argument("--wandb-project", default=None,
                   help="enable W&B logging under this project (empty = off)")
    p.add_argument("--wandb-entity", default=None, help="W&B team/entity")
    p.add_argument("--multihost", action="store_true",
                   help="multi-host training: jax.distributed.initialize() "
                        "(one process per host; also enabled by "
                        "S2A_MULTIHOST=1)")
    return p.parse_args()


def main(opt):
    from s2anet_tpu.parallel.mesh import maybe_initialize_distributed
    from s2anet_tpu.train.trainer import Trainer
    from s2anet_tpu.utils.config import load_config, prune_overrides
    from s2anet_tpu.utils.jax_cache import enable_persistent_cache

    # must run before any computation: after this, jax.devices() spans the
    # pod and the mesh/shardings below scale out unchanged
    maybe_initialize_distributed(opt.multihost or None)
    enable_persistent_cache()

    overrides = prune_overrides({
        "model": {"backbone": opt.backbone, "num_classes": opt.num_classes},
        "data": {
            "root": opt.data_root or None,
            "train_list": opt.data_root or None,
            "val_list": opt.val_root or None,
            "img_size": opt.img_size,
            "cache": opt.cache,
            "workers": opt.workers,
            "loader": opt.loader,
        },
        "train": {
            "epochs": opt.epochs,
            "batch_size": opt.batch_size,
            "lr0": opt.lr0,
            "lr_schedule": opt.lr_schedule,
            "dtype": opt.dtype,
            "seed": opt.seed,
            "save_dir": opt.save_dir,
            # store_true flags only override when actually typed
            "val_every_epoch": False if opt.noval else None,
            "pretrained": opt.pretrained,
            "nominal_batch_size": opt.nbs,
            "plots": False if opt.noplots else None,
            "wandb_project": opt.wandb_project,
            "wandb_entity": opt.wandb_entity,
        },
    })
    cfg = load_config(opt.config or None, overrides)
    if not opt.resume:
        # new runs never overwrite an existing run dir (increment_path parity)
        from dataclasses import replace

        from s2anet_tpu.train.checkpoint import increment_path

        cfg = replace(
            cfg, train=replace(cfg.train,
                               save_dir=increment_path(cfg.train.save_dir))
        )
    trainer = Trainer(cfg)
    trainer.train(resume=opt.resume or None)


if __name__ == "__main__":
    main(parse_opt())
