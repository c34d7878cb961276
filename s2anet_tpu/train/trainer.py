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
from ..parallel.mesh import (
    is_main_process,
    local_mesh_for_batch,
    make_mesh_for_batch,
    replicate_state,
    shard_batch,
)
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


class _NullLoggers:
    """Non-main-process logger: accepts the Loggers API, writes nothing."""

    wandb = tb = None

    def log_metrics(self, metrics, step):
        pass

    def close(self):
        pass


class Trainer:
    def __init__(self, cfg: Config, callbacks: Optional[Callbacks] = None):
        self.cfg = cfg
        self.callbacks = callbacks or Callbacks()
        # rank-0-only host work (checkpoints, logs, plots, val) — the
        # torch_distributed_zero_first analogue (torch_utils.py:29-41)
        self.is_main = is_main_process()
        self.num_processes = jax.process_count()
        self.save_dir = Path(cfg.train.save_dir)
        if self.is_main:
            self.save_dir.mkdir(parents=True, exist_ok=True)
            (self.save_dir / "weights").mkdir(exist_ok=True)
            cfg.save(self.save_dir / "config.yaml")
            self.loggers = Loggers(
                self.save_dir,
                use_wandb=bool(cfg.train.wandb_project),
                wandb_project=cfg.train.wandb_project,
                wandb_entity=cfg.train.wandb_entity,
                run_config=cfg.to_dict(),
            )
        else:
            self.loggers = _NullLoggers()

        self.model = S2ANet(
            backbone_name=cfg.model.backbone,
            num_classes=cfg.model.num_classes,
            strides=tuple(cfg.model.strides),
            frozen_stages=cfg.model.frozen_stages,
            norm_eval=cfg.model.norm_eval,
            with_orconv=cfg.model.with_orconv,
            backbone_remat=cfg.model.backbone_remat,
            deform_impl=cfg.model.deform_impl,
            align_offset_clamp=cfg.model.align_offset_clamp,
            bn_stats_images=getattr(cfg.model, "bn_stats_images", 0),
            bn_impl=getattr(cfg.model, "bn_impl", "auto"),
        )
        self.mesh = make_mesh_for_batch(
            cfg.train.batch_size, cfg.eval.batch_size
        )

    @property
    def accumulate(self) -> int:
        """Micro-steps per optimizer update (train.py:152-155 parity)."""
        nbs = self.cfg.train.nominal_batch_size
        if not nbs:
            return 1
        return max(round(nbs / self.cfg.train.batch_size), 1)

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
        if pretrained_backbone is None and cfg.train.pretrained:
            from ..models.torch_import import load_pretrained_backbone

            pretrained_backbone = load_pretrained_backbone(
                cfg.train.pretrained, cfg.model.backbone
            )
        if pretrained_backbone is not None:
            bb_params, bb_stats = pretrained_backbone
            params = dict(params)
            params["backbone"] = bb_params
            batch_stats = dict(batch_stats)
            batch_stats["backbone"] = bb_stats

        acc = self.accumulate
        # with accumulation the optimizer (and its LR schedule) only sees
        # one update per `acc` micro-steps
        total_steps = cfg.train.epochs * steps_per_epoch // acc
        self.lr_fn = build_lr_schedule(
            cfg.train.lr0,
            total_steps,
            max(steps_per_epoch // acc, 1),
            schedule=cfg.train.lr_schedule,
            decay_epochs_frac=tuple(cfg.train.lr_decay_epochs),
            decay_factor=cfg.train.lr_decay_factor,
            lrf=cfg.train.lrf,
            warmup_iters=max(cfg.train.warmup_iters // acc, 1),
            warmup_init_factor=cfg.train.warmup_init_factor,
        )
        self.tx = build_optimizer(
            self.lr_fn,
            momentum=cfg.train.momentum,
            weight_decay=cfg.train.weight_decay,
            grad_clip_norm=cfg.train.grad_clip_norm,
            params_example=params,
            frozen_stages=cfg.model.frozen_stages,
            accumulate=acc,
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
            cache_images=cfg.data.cache,
        )
        # cfg.train.batch_size is the GLOBAL batch; each process loads its
        # own slice of every global batch (DistributedSampler analogue:
        # sharded indices + per-process local batch, datasets_rotation.py:111)
        assert cfg.train.batch_size % self.num_processes == 0, (
            f"global batch {cfg.train.batch_size} must divide over "
            f"{self.num_processes} processes"
        )
        loader = BatchLoader(
            train_ds, cfg.train.batch_size // self.num_processes,
            shuffle=True, seed=cfg.train.seed,
            shard=jax.process_index(), num_shards=self.num_processes,
            num_workers=cfg.data.workers or None, mode=cfg.data.loader,
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
            accumulate=self.accumulate,
            compute_dtype=dtype,
            mesh=self.mesh,
        )

        if cfg.train.plots and self.is_main:
            self._plot_label_stats(train_ds)
        self.callbacks.run("on_train_start")
        best_fitness = float(jax.device_get(state.best_fitness))
        for epoch in range(start_epoch, cfg.train.epochs):
            self.callbacks.run("on_train_epoch_start")
            loader.set_epoch(epoch)
            items_hist = []
            t0 = time.time()
            for i, batch in enumerate(loader):
                self.callbacks.run("on_train_batch_start")
                if (cfg.train.plots and self.is_main
                        and epoch == start_epoch and i < 3):
                    self._plot_train_batch(batch, i)
                device_batch = shard_batch(
                    self.mesh,
                    {k: batch[k] for k in
                     ("imgs", "gt_boxes", "gt_classes", "gt_mask")},
                )
                state, items = step_fn(state, device_batch)
                # keep loss items on device: a host sync here would stall the
                # dispatch pipeline every step (tens of ms on tunneled hosts)
                items_hist.append(items)
                self.callbacks.run("on_train_batch_end")
            mean_items = (
                np.asarray(jax.device_get(items_hist), np.float64).mean(0)
                if items_hist else np.zeros(4)
            )
            dt = time.time() - t0
            lr_now = float(
                self.lr_fn(int(jax.device_get(state.step)) // self.accumulate)
            )
            metrics = {
                "train/fam_cls_loss": float(mean_items[0]),
                "train/fam_reg_loss": float(mean_items[1]),
                "train/odm_cls_loss": float(mean_items[2]),
                "train/odm_reg_loss": float(mean_items[3]),
                "lr/0": lr_now,
                "time/epoch_s": dt,
            }
            if cfg.train.val_every_epoch and cfg.data.val_list:
                final = epoch == cfg.train.epochs - 1
                if self.is_main:  # rank-0 val (train.py:394-412)
                    val_metrics = self.validate(state, save_results=final)
                    metrics.update(val_metrics)
                    fit = fitness(val_metrics)
                else:
                    fit = 0.0
                if self.num_processes > 1:
                    # every process must carry the SAME best_fitness into
                    # the replicated state (and this doubles as the epoch
                    # barrier while rank 0 validates)
                    from jax.experimental import multihost_utils

                    fit = float(multihost_utils.broadcast_one_to_all(
                        np.float32(fit)))
            else:
                fit = 0.0
            self.loggers.log_metrics(metrics, epoch)
            self.callbacks.run("on_fit_epoch_end")

            new_best = fit >= best_fitness
            if new_best:
                best_fitness = fit
            # persist best fitness into the state so --resume restores the
            # comparison point (reference train.py:203-220)
            state = state.replace(
                best_fitness=replicate_state(
                    self.mesh, jnp.asarray(best_fitness, jnp.float32))
            )
            if self.is_main:
                host_state = jax.device_get(state)
                save_checkpoint(self.save_dir / "weights" / "last", host_state,
                                {"epoch": epoch, "fitness": fit})
                if new_best:
                    save_checkpoint(self.save_dir / "weights" / "best",
                                    host_state, {"epoch": epoch, "fitness": fit})
                if (cfg.train.save_period > 0
                        and epoch % cfg.train.save_period == 0):
                    save_checkpoint(
                        self.save_dir / "weights" / f"epoch{epoch}", host_state,
                        {"epoch": epoch, "fitness": fit})
            self.callbacks.run("on_model_save")

        if self.is_main:
            strip_for_deploy(jax.device_get(state),
                             self.save_dir / "weights" / "deploy")
        self.callbacks.run("on_train_end")
        self.loggers.close()
        if cfg.train.plots and self.is_main:
            try:
                from ..utils.plots import plot_results_csv

                plot_results_csv(self.save_dir / "results.csv",
                                 self.save_dir / "results.png")
            except Exception:
                pass
        return state

    # ------------------------------------------------------------------
    def _plot_label_stats(self, train_ds):
        """Dataset label histograms at train start (plot_labels_rotate
        wiring, utils/loggers/__init__.py:100)."""
        try:
            from ..ops.rbox import poly_to_rbox_np
            from ..utils.plots import plot_label_stats

            s = float(self.cfg.data.img_size)
            boxes, classes = [], []
            for label in train_ds.labels:
                if not len(label):
                    continue
                classes.append(label[:, 0])
                boxes.append(poly_to_rbox_np(label[:, 1:] * s))
            if not classes:
                return
            plot_label_stats(
                np.concatenate(boxes), np.concatenate(classes),
                self.save_dir / "labels.png",
                num_classes=self.cfg.model.num_classes,
            )
        except Exception:
            pass

    # ------------------------------------------------------------------
    def _plot_train_batch(self, batch, i: int):
        """First-batches gt mosaic (plot_images_rotate wiring,
        utils/loggers/__init__.py:100-102)."""
        try:
            from ..utils.plots import plot_images_grid

            targets = [
                (batch["gt_boxes"][k][batch["gt_mask"][k]],
                 batch["gt_classes"][k][batch["gt_mask"][k]])
                for k in range(len(batch["imgs"]))
            ]
            plot_images_grid(
                batch["imgs"], targets,
                self.save_dir / f"train_batch{i}.jpg",
                names=list(self.cfg.data.names),
            )
        except Exception:
            pass

    # ------------------------------------------------------------------
    def validate(self, state, save_results: bool = False) -> dict:
        """Chip-level val: decode+NMS then VOC mAP against chip labels.

        Computes the 4 val losses alongside (val.py:255 parity). The eval
        step and val dataset are built once and reused across epochs."""
        from ..eval.runner import evaluate_on_chips

        cfg = self.cfg
        self.callbacks.run("on_val_start")
        if not hasattr(self, "_val_dataset"):
            self._val_dataset = DotaDataset(
                cfg.data.val_list or cfg.data.root,
                img_size=cfg.data.img_size,
                max_gt=cfg.data.max_gt,
                augment=False,
                class_names=cfg.data.names,
            )
            from ..parallel.step import make_eval_step

            # multi-host: val is rank-0-only and host-driven, so it runs on
            # THIS process's devices (the other processes wait at the next
            # collective — the broadcast in train())
            self._val_mesh = (
                self.mesh if self.num_processes == 1
                else local_mesh_for_batch(cfg.eval.batch_size)
            )
            dtype = (jnp.bfloat16 if cfg.train.dtype == "bfloat16"
                     else jnp.float32)
            self._val_step = make_eval_step(
                self.model, model_cfg=cfg.model, compute_dtype=dtype,
                mesh=self._val_mesh, use_ema=True, with_loss=True,
                imgs_size=(cfg.data.img_size, cfg.data.img_size),
                num_classes=cfg.model.num_classes,
            )
        if self.num_processes > 1:
            # global-mesh state -> local val mesh (replicas are addressable
            # on every process, so this is a local copy, not a transfer)
            state = replicate_state(self._val_mesh, jax.device_get(state))
        out = evaluate_on_chips(
            self.model, state, cfg,
            mesh=self._val_mesh,
            dataset=self._val_dataset,
            eval_step=self._val_step,
            with_loss=True,
            save_dir=self.save_dir if (save_results or cfg.eval.save_results)
            else None,
        )
        if (save_results or cfg.eval.save_results) and cfg.train.plots:
            try:
                from ..utils.plots import plot_pr_curves

                plot_pr_curves(out["per_class"], self.save_dir / "pr_curves.png")
            except Exception:
                pass
        self.callbacks.run("on_val_end")
        metrics = {
            "metrics/mAP_0.5": out["map50"],
            "metrics/precision": out["mp"],
            "metrics/recall": out["mr"],
            "map50": out["map50"],
        }
        for k in ("val/fam_cls_loss", "val/fam_reg_loss",
                  "val/odm_cls_loss", "val/odm_reg_loss"):
            if k in out:
                metrics[k] = out[k]
        return metrics
