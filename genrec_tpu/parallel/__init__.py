"""Distributed layer: mesh, partition rules, row-sharded tables.

The reference has no parallelism of any kind (SURVEY.md §2.5); this package
is the added TPU-native distributed layer: `jax.sharding.Mesh` +
PartitionSpec rules for DP/TP, `shard_map` collectives over ICI for the
row-sharded embedding/codebook path, and multi-host init helpers.
"""

from genrec_tpu.parallel.mesh import make_mesh  # noqa: F401
from genrec_tpu.parallel.sharding import (batch_spec, match_partition_rules,  # noqa: F401
                                          replicate_spec, shard_params)
