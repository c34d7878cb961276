from .mesh import make_mesh, make_mesh_for_batch, replicate_state, shard_batch
from .step import make_train_step, make_eval_step

__all__ = [
    "make_mesh",
    "make_mesh_for_batch",
    "replicate_state",
    "shard_batch",
    "make_train_step",
    "make_eval_step",
]
