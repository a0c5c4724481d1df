from .edge_parallel import (
    make_edge_sharded_train_step,
    shard_fused_graphs,
    shard_step_graph,
)
from .mesh import make_mesh
from .spmd import param_shardings, make_sharded_train_step

__all__ = [
    "make_mesh",
    "param_shardings",
    "make_sharded_train_step",
    "make_edge_sharded_train_step",
    "shard_fused_graphs",
    "shard_step_graph",
]
