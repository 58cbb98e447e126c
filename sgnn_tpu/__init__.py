"""sgnn_tpu — a TPU-native sample-based GNN training framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
AiX-im/Sample-based-GNN (NeutronOrch / NeutronStar lineage): fanout-based
mini-batch neighbor sampling, sparse graph aggregation with autodiff,
GCN / GraphSAGE / GAT model families, hotness-aware embedding caching with
bounded staleness, super-batch pipelined training, and multi-chip scaling
via `jax.sharding` meshes.

Layer map (TPU-native redesign of reference SURVEY.md §1):

  config    — cfg-file parity parser           (ref: core/GraphSegment.cpp:222)
  data      — NTS binary/text dataset loaders  (ref: core/ntsDataloador.hpp)
  graph     — CSC/CSR containers + partitioner (ref: core/graph.hpp, FullyRepGraph.hpp)
  sampler   — fanout neighbor sampling         (ref: core/ntsFastSampler.hpp)
  ops       — differentiable graph ops         (ref: core/nts*GraphOp.hpp)
  nn        — layers + reference-parity Adam   (ref: core/NtsScheduler.hpp:680)
  models    — GCN / GraphSAGE / GAT            (ref: toolkits/*.hpp)
  cache     — hotness presample + embedding/feature caches
              (ref: core/ntsBaseOp.hpp:409, ntsDataloador.hpp cache vars)
  parallel  — mesh / data-parallel / halo exchange (ref: comm/, cuda NCCL)
  train     — engines + trainer                (ref: toolkits/main.cpp:46)
"""

__version__ = "0.1.0"
