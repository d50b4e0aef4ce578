"""Bucketed padded event batches — the TPU-native ragged-collation layer.

The reference relies on PyG ``DataLoader`` collation: variable-size node sets
are concatenated and a per-node ``batch`` assignment vector is emitted
(reference model/data_loader.py:108-109).  That layout forces dynamic shapes
and irregular scatter/gather — hostile to XLA.

Here every batch is a dense, static-shape pytree:

* node features padded to ``[B, Nmax, F]`` with a boolean node ``mask``;
* graphs are fixed-degree neighbor lists ``[B, Nmax, K]`` + edge mask
  (``K`` mirrors the reference's ``max_num_neighbors=255`` cap,
  reference train.py:48);
* ``Nmax`` is drawn from a small set of capacity buckets so only a handful
  of distinct programs are ever compiled.

Segment reductions over the ``batch`` vector (torch_scatter's
``scatter_add``, reference model/net.py:55-56) become masked axis
reductions — dense, fuseable, MXU/VPU friendly.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

# Feature order after ingest (reference model/data_loader.py:70-77):
#   continuous[0:8] = px, py, pt, eta, d0, dz, mass, puppiWeight
#   categorical[0:3] = pdgId, charge, fromPV
CONTINUOUS_DIM = 8
CATEGORICAL_DIM = 3
NUM_FEATURES = CONTINUOUS_DIM + CATEGORICAL_DIM  # 11
TARGET_DIM = 11  # y: genMETx/y, pfMETx/y, puppiMETx/y, deepRespx/y, deepResox/y, HT


class EventBatch(NamedTuple):
    """A dense batch of padded particle-flow events.

    Attributes:
      x_cont: ``[B, N, 8]`` float — px, py, pt, eta, d0, dz, mass, puppiWeight.
      x_cat:  ``[B, N, 3]`` int32 — pdgId, charge, fromPV.
      mask:   ``[B, N]`` bool — True for real candidates, False for padding.
      y:      ``[B, T]`` float — event targets (T >= 6; 11 when DeepMET
              baselines present, reference evaluate.py:73).
      num_valid: ``[B]`` int32 — number of real candidates per event.
    """

    x_cont: jnp.ndarray
    x_cat: jnp.ndarray
    mask: jnp.ndarray
    y: jnp.ndarray
    num_valid: jnp.ndarray

    @property
    def batch_size(self) -> int:
        return self.x_cont.shape[0]

    @property
    def max_nodes(self) -> int:
        return self.x_cont.shape[1]


class Neighborhood(NamedTuple):
    """Fixed-degree neighbor lists for a batch of graphs.

    Replaces COO ``edge_index`` (reference train.py:48).  ``idx[b, i, k]`` is
    the node index (within event ``b``) of the k-th neighbor of node ``i``;
    ``mask[b, i, k]`` marks valid edges.  Invalid slots point at node 0 and
    must be masked in every consumer.
    """

    idx: jnp.ndarray   # [B, N, K] int32
    mask: jnp.ndarray  # [B, N, K] bool

    @property
    def max_degree(self) -> int:
        return self.idx.shape[-1]

    def num_edges(self) -> jnp.ndarray:
        """Total valid directed edges per batch element."""
        return jnp.sum(self.mask, axis=(1, 2))


def bucket_for(n: int, buckets: Sequence[int]) -> int:
    """Smallest capacity bucket >= n (events larger than all buckets get
    truncated to the largest — mirrors the reference's implicit cap via
    max-neighbor truncation; log a warning upstream)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def collate(
    events: Sequence[Tuple[np.ndarray, np.ndarray]],
    buckets: Sequence[int] = (128, 256, 512, 1024, 2048, 4096, 8192),
    pad_to: int | None = None,
    pad_events_to: int | None = None,
) -> EventBatch:
    """Pad a list of ``(x [n_i, 11], y [T])`` events into one EventBatch.

    Equivalent of PyG DataLoader collation (reference
    model/data_loader.py:108-109) with padding instead of concatenation.
    ``pad_events_to`` pads the batch axis with empty events
    (``num_valid == 0``) so partial final batches reuse the same compiled
    program; losses/metrics skip empty events.
    """
    assert len(events) > 0
    n_max = max(x.shape[0] for x, _ in events)
    cap = pad_to if pad_to is not None else bucket_for(n_max, buckets)
    B = max(len(events), pad_events_to or 0)
    t_dim = max(int(np.asarray(y).reshape(-1).shape[0]) for _, y in events)

    x_cont = np.zeros((B, cap, CONTINUOUS_DIM), dtype=np.float32)
    x_cat = np.zeros((B, cap, CATEGORICAL_DIM), dtype=np.int32)
    mask = np.zeros((B, cap), dtype=bool)
    ys = np.zeros((B, t_dim), dtype=np.float32)
    nv = np.zeros((B,), dtype=np.int32)

    for b, (x, y) in enumerate(events):
        n = min(x.shape[0], cap)
        x_cont[b, :n] = x[:n, :CONTINUOUS_DIM]
        x_cat[b, :n] = x[:n, CONTINUOUS_DIM:NUM_FEATURES].astype(np.int32)
        mask[b, :n] = True
        yv = np.asarray(y, dtype=np.float32).reshape(-1)
        ys[b, : yv.shape[0]] = yv
        nv[b] = n

    # Host (numpy) arrays by design: loaders memoize collated batches, and a
    # host-resident cache (a) never pins the dataset in HBM and (b) gives
    # prefetch_to_device a real H2D copy to overlap with compute.  jit calls
    # convert on entry; explicit placement is the feed's job
    # (data/loader.prefetch_to_device, parallel/mesh.shard_batch).
    return EventBatch(
        x_cont=x_cont,
        x_cat=x_cat,
        mask=mask,
        y=ys,
        num_valid=nv,
    )


def pad_batch_events(batch: EventBatch, to: int) -> EventBatch:
    """Pad the batch axis with empty events (``num_valid == 0``) up to
    ``to`` rows.  Losses and metrics exclude empty events (train/loss.py,
    train/metrics.finalize_resolutions), so a padded batch produces
    bit-identical results — this is how odd-sized final eval batches are
    kept sharded over a mesh's data axis instead of falling back to one
    device."""
    B = batch.batch_size
    if to <= B:
        return batch
    pad = to - B

    def padarr(a):
        a = np.asarray(a)
        return np.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))

    return EventBatch(*(padarr(f) for f in batch))
