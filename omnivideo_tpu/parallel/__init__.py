from .mesh import AXES, create_mesh, mesh_shape_for
from .ring import hybrid_attention, ring_attention
from .sharding import batch_sharding, params_shardings, seq_constraint, shard_params
from .ulysses import ulysses_attention

__all__ = [
    "AXES",
    "create_mesh",
    "mesh_shape_for",
    "params_shardings",
    "shard_params",
    "batch_sharding",
    "seq_constraint",
    "ulysses_attention",
    "ring_attention",
    "hybrid_attention",
]
