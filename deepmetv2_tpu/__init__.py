"""deepmetv2_tpu — a TPU-native GNN message-passing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of DeepMETv2's
``graph-met`` (reference at /root/reference): regressing CMS missing
transverse energy (MET) from per-event particle-flow candidate point clouds
with EdgeConv-family graph networks.

Design stance (see SURVEY.md §7): the reference's COO ``edge_index`` + ragged
node concatenation is replaced by bucketed padded event batches
``[B, Nmax, F]`` with node masks, and graphs are fixed-degree neighbor lists
``[B, Nmax, K]`` + edge masks.  All compute is static-shape, masked, and
jit-compiled; distribution is a Mesh/PartitionSpec layer (pjit/shard_map),
not a wire protocol.
"""

__version__ = "0.1.0"

from deepmetv2_tpu.data.batching import EventBatch, Neighborhood  # noqa: F401
