from .edge_parallel import (
    make_edge_sharded_train_step,
    shard_fused_graphs,
    shard_step_graph,
)
from .engine import ShardedPEATrainer, make_sharded_kg_trainer
from .mesh import make_mesh
from .spmd import param_shardings, make_sharded_train_step
from .a2a import build_a2a_setup, make_a2a_parts, make_a2a_train_step
from .sharded_embedding import (
    build_static_plan,
    sharded_lookup,
    static_lookup,
)
from .multihost import (
    HostBatchFeed,
    global_batch,
    initialize_runtime,
    make_pod_mesh,
    process_local_rows,
)

__all__ = [
    "ShardedPEATrainer",
    "make_sharded_kg_trainer",
    "make_a2a_parts",
    "make_mesh",
    "param_shardings",
    "make_sharded_train_step",
    "make_edge_sharded_train_step",
    "make_a2a_train_step",
    "build_a2a_setup",
    "build_static_plan",
    "sharded_lookup",
    "static_lookup",
    "shard_fused_graphs",
    "shard_step_graph",
    "initialize_runtime",
    "make_pod_mesh",
    "process_local_rows",
    "global_batch",
    "HostBatchFeed",
]
