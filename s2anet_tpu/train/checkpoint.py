"""Checkpoint save / load / resume (orbax) + deploy stripping.

Replaces the reference's torch.save dict checkpoints
(train.py:422-439: {epoch, best_fitness, model fp16, ema, updates, optimizer,
date}) with orbax checkpoints of the full TrainState plus metadata.
``strip_optimizer`` (general.py:774) becomes :func:`strip_for_deploy` —
drops optimizer/EMA-source state and keeps EMA weights.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _abs(path) -> str:
    return str(Path(path).expanduser().resolve())


def save_checkpoint(path, state: TrainState, metadata: Optional[dict] = None):
    """Save a full train state + sidecar metadata json."""
    path = Path(_abs(path))
    if path.exists():
        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state))
    if metadata is not None:
        (path.parent / (path.name + ".meta.json")).write_text(
            json.dumps(metadata, default=str)
        )


def load_checkpoint(path, target: TrainState) -> TrainState:
    """Restore a train state saved by :func:`save_checkpoint`."""
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(_abs(path), target=jax.device_get(target))


def load_metadata(path) -> dict:
    meta = Path(_abs(path)).parent / (Path(path).name + ".meta.json")
    if meta.exists():
        return json.loads(meta.read_text())
    return {}


def increment_path(path, exist_ok: bool = False) -> str:
    """Auto-increment a run dir: runs/exp -> runs/exp2, exp3, ...
    (utils/general.py ``increment_path`` parity). Returns the first unused
    path; with ``exist_ok`` the path is returned as-is."""
    p = Path(path)
    if exist_ok or not p.exists():
        return str(p)
    for n in range(2, 10000):
        cand = p.with_name(f"{p.name}{n}")
        if not cand.exists():
            return str(cand)
    raise RuntimeError(f"no free increment for {path}")


def get_latest_run(search_dir="runs/train"):
    """Newest checkpoint dir under runs/train/*/weights/last (general.py:182)."""
    cands = sorted(
        Path(search_dir).glob("*/weights/last"),
        key=lambda p: p.stat().st_mtime,
    )
    return str(cands[-1]) if cands else ""


def strip_for_deploy(state: TrainState, out_path):
    """Keep only EMA params + batch stats, halved to bfloat16, for serving."""
    deploy = {
        "params": jax.tree_util.tree_map(
            lambda x: np.asarray(x, dtype=np.float32), state.ema_params
        ),
        "batch_stats": jax.tree_util.tree_map(
            lambda x: np.asarray(x, dtype=np.float32), state.ema_batch_stats
        ),
    }
    path = Path(_abs(out_path))
    if path.exists():
        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, deploy)
    return deploy


def load_deploy(path, target):
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(_abs(path), target=jax.device_get(target))
