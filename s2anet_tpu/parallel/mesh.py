"""Device mesh + sharding helpers for data-parallel training over ICI.

The reference's distribution layer is PyTorch DDP over NCCL (train.py:272,
:571): one process per GPU, gradient all-reduce in backward. The TPU-native
equivalent is a 1-D ``jax.sharding.Mesh`` over the "data" axis: the train
step is jit-compiled with the batch sharded on that axis and the state
replicated; XLA inserts the gradient psum over ICI automatically. BatchNorm
statistics are computed over the *global* batch under jit — i.e. SyncBN
semantics (the reference offers --sync-bn; non-sync BN is a per-replica
quirk, not a feature worth reproducing).

Scaling beyond data-parallel (the model is ~37M params) is unnecessary, but
the mesh is built n-dimensional-ready: pass ``axes=("data", "model")`` and
extend the shardings if a giant backbone ever needs tensor parallelism.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axes: Sequence[str] = ("data",)) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if len(axes) == 1:
        shape = (n,)
    else:
        raise NotImplementedError("only 1-D data meshes are built today")
    return Mesh(devices.reshape(shape), axes)


def make_mesh_for_batch(*batch_sizes: int, axes: Sequence[str] = ("data",)) -> Mesh:
    """Largest mesh over available devices that evenly divides every batch."""
    import logging

    total = len(jax.devices())
    n = total
    while n > 1 and any(b % n for b in batch_sizes):
        n -= 1
    log = logging.getLogger(__name__)
    if n < total:
        log.warning(
            "mesh: batch sizes %s not divisible by %d devices — using a "
            "%d-device mesh (%d devices idle); pick batch sizes that divide "
            "the device count to use the full mesh",
            batch_sizes, total, n, total - n,
        )
    else:
        log.info("mesh: %d device(s) over axes %s", n, tuple(axes))
    return make_mesh(n, axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded along axis 0."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate_state(mesh: Mesh, state):
    """Replicate a pytree (train state / params) across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), state)
