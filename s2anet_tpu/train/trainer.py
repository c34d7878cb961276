"""Training driver: the reference's train.py loop, re-built functional.

Orchestrates (parity: /root/reference/train.py:60-468):
  * model/optimizer/EMA construction with the published recipe defaults,
  * jit-compiled data-parallel train step over the device mesh (warmup, LR
    schedule, grad clip, EMA all inside the step — no per-iteration host sync),
  * per-epoch validation with mAP50 fitness (fitness = 1.0 * mAP50,
    utils/metrics.py:21-24), best/last checkpointing, CSV/TB logging,
  * resume from checkpoint.

bf16 compute replaces the reference's AMP fp16 (train.py:294).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dota import BatchLoader, DotaDataset
from ..models.detector import S2ANet
from ..parallel.mesh import make_mesh_for_batch, replicate_state, shard_batch
from ..parallel.step import make_train_step
from ..utils.callbacks import Callbacks
from ..utils.config import Config
from ..utils.loggers import Loggers
from .checkpoint import load_checkpoint, save_checkpoint, strip_for_deploy
from .optim import build_optimizer
from .schedule import build_lr_schedule
from .state import create_train_state


def fitness(metrics: dict) -> float:
    """fitness = 1.0 * mAP50 (utils/metrics.py:21-24)."""
    return float(metrics.get("map50", 0.0))


class Trainer:
    def __init__(self, cfg: Config, callbacks: Optional[Callbacks] = None):
        self.cfg = cfg
        self.callbacks = callbacks or Callbacks()
        self.save_dir = Path(cfg.train.save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        (self.save_dir / "weights").mkdir(exist_ok=True)
        cfg.save(self.save_dir / "config.yaml")
        self.loggers = Loggers(self.save_dir)

        self.model = S2ANet(
            backbone_name=cfg.model.backbone,
            num_classes=cfg.model.num_classes,
            strides=tuple(cfg.model.strides),
            frozen_stages=cfg.model.frozen_stages,
            norm_eval=cfg.model.norm_eval,
            with_orconv=cfg.model.with_orconv,
        )
        self.mesh = make_mesh_for_batch(
            cfg.train.batch_size, cfg.eval.batch_size
        )

    # ------------------------------------------------------------------
    def build_state(self, steps_per_epoch: int, pretrained_backbone=None):
        cfg = self.cfg
        s = cfg.data.img_size
        rng = jax.random.PRNGKey(cfg.train.seed)
        variables = self.model.init(
            rng, jnp.zeros((1, s, s, 3), jnp.float32), train=False
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if pretrained_backbone is not None:
            bb_params, bb_stats = pretrained_backbone
            params = dict(params)
            params["backbone"] = bb_params
            batch_stats = dict(batch_stats)
            batch_stats["backbone"] = bb_stats

        total_steps = cfg.train.epochs * steps_per_epoch
        self.lr_fn = build_lr_schedule(
            cfg.train.lr0,
            total_steps,
            steps_per_epoch,
            schedule=cfg.train.lr_schedule,
            decay_epochs_frac=tuple(cfg.train.lr_decay_epochs),
            decay_factor=cfg.train.lr_decay_factor,
            lrf=cfg.train.lrf,
            warmup_iters=cfg.train.warmup_iters,
            warmup_init_factor=cfg.train.warmup_init_factor,
        )
        self.tx = build_optimizer(
            self.lr_fn,
            momentum=cfg.train.momentum,
            weight_decay=cfg.train.weight_decay,
            grad_clip_norm=cfg.train.grad_clip_norm,
            params_example=params,
            frozen_stages=cfg.model.frozen_stages,
        )
        state = create_train_state(params, batch_stats, self.tx)
        return replicate_state(self.mesh, state)

    # ------------------------------------------------------------------
    def train(self, resume: Optional[str] = None):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.train.dtype == "bfloat16" else jnp.float32

        train_ds = DotaDataset(
            cfg.data.train_list or cfg.data.root,
            img_size=cfg.data.img_size,
            max_gt=cfg.data.max_gt,
            augment=True,
            fliplr=cfg.data.fliplr,
            flipud=cfg.data.flipud,
            rot90=cfg.data.degrees > 0,
            hsv=(cfg.data.hsv_h, cfg.data.hsv_s, cfg.data.hsv_v),
            mosaic=cfg.data.mosaic,
            mixup=cfg.data.mixup,
            translate=cfg.data.translate,
            scale=cfg.data.scale,
            class_names=cfg.data.names,
        )
        loader = BatchLoader(
            train_ds, cfg.train.batch_size, shuffle=True, seed=cfg.train.seed
        )
        steps_per_epoch = max(len(loader), 1)
        state = self.build_state(steps_per_epoch)
        start_epoch = 0
        if resume:
            state = load_checkpoint(resume, jax.device_get(state))
            state = replicate_state(self.mesh, state)
            start_epoch = int(state.step) // steps_per_epoch

        step_fn = make_train_step(
            self.model,
            self.tx,
            imgs_size=(cfg.data.img_size, cfg.data.img_size),
            num_classes=cfg.model.num_classes,
            model_cfg=cfg.model,
            ema_decay=cfg.train.ema_decay,
            ema_ramp=cfg.train.ema_ramp_updates,
            compute_dtype=dtype,
            mesh=self.mesh,
        )

        self.callbacks.run("on_train_start")
        best_fitness = float(jax.device_get(state.best_fitness))
        for epoch in range(start_epoch, cfg.train.epochs):
            self.callbacks.run("on_train_epoch_start")
            loader.set_epoch(epoch)
            mean_items = np.zeros(4)
            t0 = time.time()
            for i, batch in enumerate(loader):
                self.callbacks.run("on_train_batch_start")
                device_batch = shard_batch(
                    self.mesh,
                    {k: batch[k] for k in
                     ("imgs", "gt_boxes", "gt_classes", "gt_mask")},
                )
                state, items = step_fn(state, device_batch)
                mean_items += (np.asarray(items) - mean_items) / (i + 1)
                self.callbacks.run("on_train_batch_end")
            dt = time.time() - t0
            lr_now = float(self.lr_fn(int(jax.device_get(state.step))))
            metrics = {
                "train/fam_cls_loss": float(mean_items[0]),
                "train/fam_reg_loss": float(mean_items[1]),
                "train/odm_cls_loss": float(mean_items[2]),
                "train/odm_reg_loss": float(mean_items[3]),
                "lr/0": lr_now,
                "time/epoch_s": dt,
            }
            if cfg.train.val_every_epoch and cfg.data.val_list:
                val_metrics = self.validate(state)
                metrics.update(val_metrics)
                fit = fitness(val_metrics)
            else:
                fit = 0.0
            self.loggers.log_metrics(metrics, epoch)
            self.callbacks.run("on_fit_epoch_end")

            host_state = jax.device_get(state)
            save_checkpoint(self.save_dir / "weights" / "last", host_state,
                            {"epoch": epoch, "fitness": fit})
            if fit >= best_fitness:
                best_fitness = fit
                save_checkpoint(self.save_dir / "weights" / "best", host_state,
                                {"epoch": epoch, "fitness": fit})
            if cfg.train.save_period > 0 and epoch % cfg.train.save_period == 0:
                save_checkpoint(
                    self.save_dir / "weights" / f"epoch{epoch}", host_state,
                    {"epoch": epoch, "fitness": fit})
            self.callbacks.run("on_model_save")

        strip_for_deploy(jax.device_get(state), self.save_dir / "weights" / "deploy")
        self.callbacks.run("on_train_end")
        self.loggers.close()
        return state

    # ------------------------------------------------------------------
    def validate(self, state) -> dict:
        """Chip-level val: decode+NMS then VOC mAP against chip labels."""
        from ..eval.runner import evaluate_on_chips

        cfg = self.cfg
        self.callbacks.run("on_val_start")
        out = evaluate_on_chips(
            self.model, state, cfg,
            mesh=self.mesh,
        )
        self.callbacks.run("on_val_end")
        return {
            "metrics/mAP_0.5": out["map50"],
            "metrics/precision": out["mp"],
            "metrics/recall": out["mr"],
            "map50": out["map50"],
        }
