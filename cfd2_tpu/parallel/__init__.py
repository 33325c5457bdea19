"""Multi-chip parallelism.

The reference is strictly single-GPU (SURVEY.md §2: no DP/TP/PP/EP, no
collectives).  The TPU-native scaling axes provided here:

* :mod:`batch` — data parallelism over independent simulations (a batch of
  cases sharded over a device mesh axis), the mapping SURVEY.md §2 prescribes
  for this workload;
* (planned) spatial domain decomposition with halo exchange via ``shard_map``
  + ``ppermute`` over ICI for beyond-HBM meshes.
"""

from .batch import batched_initial_state, batched_multi_step, batched_step, shard_batch

__all__ = ["batched_step", "batched_multi_step", "batched_initial_state",
           "shard_batch"]
