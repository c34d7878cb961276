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


def maybe_initialize_distributed(enable: Optional[bool] = None) -> bool:
    """Multi-host entry point: ``jax.distributed.initialize()`` when asked.

    The reference launches one process per GPU via torch.distributed.launch
    and NCCL-inits from env vars (/root/reference/train.py:566-571). The JAX
    equivalent is one process per HOST with ``jax.distributed.initialize()``
    (auto-discovering the coordinator on TPU pods / from the standard env
    vars elsewhere), after which ``jax.devices()`` spans the whole pod and
    the same jit-with-mesh code path scales out — the collectives are
    already in the compiled program.

    Gated: runs only when ``enable`` is True or the ``S2A_MULTIHOST`` env
    var is set truthy (so single-host runs never pay coordinator discovery).
    Returns True when running multi-process after the call.
    """
    import os

    if enable is None:
        enable = os.environ.get("S2A_MULTIHOST", "") not in ("", "0")
    if enable:
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError) as e:  # already initialized / 1-proc
            import logging

            logging.getLogger(__name__).info(
                "jax.distributed.initialize skipped: %s", e)
    return jax.process_count() > 1


def is_main_process() -> bool:
    """The rank-0-only-work guard (torch_distributed_zero_first analogue,
    /root/reference/utils/torch_utils.py:29-41)."""
    return jax.process_index() == 0


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


def local_mesh_for_batch(*batch_sizes: int,
                         axes: Sequence[str] = ("data",)) -> Mesh:
    """Largest mesh over THIS PROCESS's devices dividing every batch size.

    Used for rank-0-only work (validation) in multi-host runs: the val loop
    is host-driven, so it runs on the main process's local devices while the
    other processes wait at the next collective (the reference's rank-0 val,
    train.py:394-412).
    """
    devices = jax.local_devices()
    n = len(devices)
    while n > 1 and any(b % n for b in batch_sizes):
        n -= 1
    return Mesh(np.asarray(devices[:n]).reshape((n,)), axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded along axis 0.

    Single-host meshes take the direct ``device_put`` path. When the mesh
    spans processes (multi-host), each process holds only its OWN slice of
    the global batch (the sharded ``BatchLoader`` produced it) and the
    global array is assembled from the per-process locals — the
    DistributedSampler-feeding-DDP analogue.
    """
    sh = batch_sharding(mesh)
    if sh.is_fully_addressable:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sh, x, global_shape)

    return jax.tree_util.tree_map(put, batch)


def replicate_state(mesh: Mesh, state):
    """Replicate a pytree (train state / params) across the mesh.

    Multi-host: every process holds the same full value (same seed init or
    same checkpoint), so each contributes its local copy to the replicated
    global array.
    """
    sh = replicated(mesh)
    if sh.is_fully_addressable:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), state)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sh, x, x.shape)

    return jax.tree_util.tree_map(put, state)
