"""Metric logging: CSV always, TensorBoard when available, W&B on request.

Parity: /root/reference/utils/loggers/__init__.py:40-181 (csv results +
TB scalars; the same key set — 4 train losses, P/R/mAP50, 4 val losses,
LR) and utils/loggers/wandb/wandb_utils.py:106-180 (run init with config,
per-epoch metric logging). W&B activates only when a project is configured
AND the wandb package imports; it is never a hard dependency.
"""

from __future__ import annotations

import csv
import time
from pathlib import Path
from typing import Dict, Optional

LOG_KEYS = (
    "train/fam_cls_loss", "train/fam_reg_loss",
    "train/odm_cls_loss", "train/odm_reg_loss",
    "metrics/precision", "metrics/recall", "metrics/mAP_0.5",
    "val/fam_cls_loss", "val/fam_reg_loss",
    "val/odm_cls_loss", "val/odm_reg_loss",
    "lr/0",
)


class Loggers:
    def __init__(self, save_dir, use_tensorboard: bool = True,
                 use_wandb: bool = False, wandb_project: str = "s2anet_tpu",
                 wandb_entity: str = "", run_config: Optional[dict] = None):
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.csv_path = self.save_dir / "results.csv"
        self._csv_keys = None
        self.tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(str(self.save_dir))
            except Exception:
                self.tb = None
        # W&B backend (utils/loggers/wandb parity): active only when the
        # wandb package is importable AND explicitly requested; the run
        # carries the full config dict (wandb_utils.py:119 logs opt/hyp)
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                self.wandb = wandb.init(
                    project=wandb_project or "s2anet_tpu",
                    entity=wandb_entity or None,
                    name=self.save_dir.name,
                    dir=str(self.save_dir), resume="allow",
                    config=run_config,
                )
            except Exception:
                self.wandb = None

    def log_metrics(self, metrics: Dict[str, float], step: int):
        metrics = {"epoch_or_step": step, **metrics}
        if self._csv_keys is None:
            self._csv_keys = list(metrics.keys())
        new_keys = [k for k in metrics if k not in self._csv_keys]
        if new_keys:
            # schema grew (e.g. val metrics appear after epoch 0): rewrite the
            # whole file under the widened header instead of dropping columns
            self._csv_keys = self._csv_keys + new_keys
            if self.csv_path.exists():
                with open(self.csv_path, newline="") as f:
                    rows = list(csv.DictReader(f))
                with open(self.csv_path, "w", newline="") as f:
                    w = csv.DictWriter(f, fieldnames=self._csv_keys, restval="")
                    w.writeheader()
                    w.writerows(rows)
        write_header = not self.csv_path.exists()
        with open(self.csv_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._csv_keys, restval="")
            if write_header:
                w.writeheader()
            w.writerow(metrics)
        if self.tb is not None:
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self.tb.add_scalar(k, v, step)
        if self.wandb is not None:
            self.wandb.log(
                {k: v for k, v in metrics.items()
                 if isinstance(v, (int, float))},
                step=step,
            )

    def close(self):
        if self.tb is not None:
            self.tb.flush()
            self.tb.close()
        if self.wandb is not None:
            self.wandb.finish()


class Profile:
    """Wall-clock accumulator context manager (general.py:100-113 analogue;
    device sync is the caller's business — wrap jax.block_until_ready)."""

    def __init__(self):
        self.t = 0.0
        self.n = 0

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.t += time.perf_counter() - self._start
        self.n += 1

    @property
    def avg(self):
        return self.t / max(self.n, 1)
