"""graph_recsys_benchmark_tpu — TPU-native metapath-aware GNN recommender engine.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the PEAGNN
benchmark suite (reference: ecml-peagnn/graph_recsys_benchmark), designed
TPU-first:

  * message passing over static padded edge tensors via segment-sum /
    segment-softmax kernels (Pallas one-hot-matmul kernel on TPU; XLA
    scatter path as the correctness oracle everywhere),
  * whole training epochs run as a single jitted ``lax.scan`` (negative
    sampling, batching and the optimizer update all on device),
  * ranking evaluation (leave-one-out, 99 sampled negatives, HR/NDCG/AUC at
    k=5..20) as one vectorized jitted pass over all test users,
  * SPMD scale-out via ``jax.sharding`` meshes (data-parallel batches,
    row-sharded embedding tables).

Package map (mirrors SURVEY.md section 7.1):
  ops/       segment primitives + Pallas kernels (replaces torch-scatter/-sparse)
  graph.py   static graph tensors (padded, sorted-by-destination edge lists)
  nn/        conv layers: GCN, GAT, SAGE, NGCF, KGAT, KGCN
  models/    PEAGCN/PEAGAT/PEASage, NGCF, KGAT, KGCN, CFKG, NFM,
             MetaPath2Vec, HeRec, walk-MLP scorer
  data/      HIN builders (MovieLens, Yelp, synthetic), split + sampling tables
  train/     jitted train steps/epochs, losses, optimizers, solver
  eval/      vectorized ranking metrics
  parallel/  device mesh + sharded train step + sharded embedding lookup
  utils/     checkpointing, config, logging
"""

__version__ = "0.1.0"
