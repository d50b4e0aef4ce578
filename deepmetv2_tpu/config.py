"""Configuration dataclasses.

The reference hard-codes every hyperparameter as scattered constants
(reference train.py:66,75-80,100; model/net.py:41-43; model/data_loader.py:98-104).
Here they are first-class, named, and serializable.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class GraphConfig:
    """Graph-construction settings (reference train.py:47-48)."""

    delta_r: float = 0.4            # radius in (eta, phi) space
    max_neighbors: int = 256        # reference caps at 255 (train.py:48); we round
                                    # to a lane-friendly 256 (incl. self-loop)
    self_loops: bool = True
    # The reference's metric has NO phi +/- pi wraparound (train.py:47 comment,
    # acknowledged bug). Keep it off by default for parity; flip for physics.
    phi_wraparound: bool = False
    # Graph representation: 'neighbor_list' (explicit [N,K] lists, general)
    # or 'window' (implicit eta-sorted radius graph -> gather-free Pallas
    # aggregation; uncapped degree, requires window_halo >= the data's
    # sorted-order neighbor span, see data/sorting.required_halo).
    mode: str = "neighbor_list"
    window_halo: int = 128
    # Batches arrive already eta-sorted (loader presort_eta=True): the
    # compiled steps skip the per-step device argsort entirely.  Only set
    # together with a presorting loader — window mode silently computes
    # wrong adjacencies on unsorted input.
    presorted: bool = False


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """GraphMETNetwork hyperparameters (reference model/net.py:41-43,
    model/graph_met_network.py:12-45)."""

    continuous_dim: int = 8
    categorical_dim: int = 3
    hidden_dim: int = 32
    conv_depth: int = 2
    output_dim: int = 1
    # |pdgId| vocabulary (reference model/graph_met_network.py:45)
    pdgs: Tuple[int, ...] = (1, 2, 11, 13, 22, 130, 211)
    # Opt-in mixed precision for the EdgeConv hot path: 'bfloat16' runs
    # the conv GEMMs as MXU-bf16 with f32 accumulation and the window
    # aggregation kernel on bf16 VALUES (halved window DMA/VMEM).
    # Positions/adjacency stay f32 — the distance-tie analysis
    # (ops/graph.py) stands.  MEASURED on v5e: throughput-neutral (the
    # kernel is VPU-bound on the f32 coordinate math; the 256-lane bf16
    # packing variant was 30-45% SLOWER and is not used — numbers in
    # ops/pallas/edgeconv_window._pack_factor); the win is memory, not
    # speed.  Accuracy delta gated by bench's numerics entry
    # (one bf16 rounding of the aggregated term, < 2e-2 scale-relative)
    # and tests/test_window.py::test_bf16_window_close_to_f32.
    # Backward caveat: the window kernel routes the max-gradient to EVERY
    # source tied with the selected max, and bf16's 8-bit mantissa makes
    # value ties far likelier than f32's — clustered activations can
    # overcount dc systematically.  The test bounds the median AND the
    # p95 relative grad error; if a model's activations collapse to few
    # distinct bf16 values, train f32.
    compute_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class DRNConfig:
    """DynamicReductionNetwork hyperparameters
    (reference model/dynamic_reduction_network.py:39-79)."""

    input_dim: int = 11
    hidden_dim: int = 64
    output_dim: int = 2
    k: int = 16
    # Undirected-degree cap of the symmetrized kNN graph (None -> 2k,
    # ops/graph.to_undirected's default).  The reference's to_undirected
    # is uncapped; nodes whose undirected degree exceeds the cap keep a
    # truncated neighbor set (policy documented in ops/dyn_graph.py).
    und_cap: "int | None" = None
    # Run the EdgeConv gather's backward as a mirror gather instead of
    # XLA's scatter-add adjoint (ops/segment.gather_neighbors_mirror).
    # Measured net-negative on v5e at the training scale (the scatter
    # adjoint is not the bottleneck there), so off by default; kept
    # selectable for other scales/backends.  NOTE: on the FUSED graph
    # path this also changes topology, not just the backward — the list
    # is intersected with mutual-keep, dropping cap-bound one-sided
    # edges, i.e. the composed path's semantics (ops/dyn_graph.py;
    # equivalence in the hub-free regime is tested in
    # tests/test_dyn_graph.py::test_fused_mirror_matches_composed).
    mirror_gather: bool = False
    # 'add' is the DRN ctor default (model/dynamic_reduction_network.py:40)
    # and is what makes a *sum* target (MET) representable through the
    # pooling stack; the commented-out Net used 'max' (model/net.py:17).
    aggr: str = "add"
    pool_rounds: int = 2       # two knn+coarsen stages
    # Output head: 'polar' = the reference's commented Net head (softplus
    # MET magnitude + sigmoid-bounded phi, model/net.py:33-35); 'cartesian'
    # = direct (METx, METy) regression — better conditioned (no phi
    # wraparound discontinuity at +/-pi, no saturating sigmoid).
    head: str = "polar"
    # Node-sharded (edge-partitioned) runs only: build each round's
    # feature-space kNN graph with the ring-pipelined top-k
    # (parallel/knn.knn_graph_sharded_ring) instead of the all-gather
    # build.  Exact same graph; peak per-chip memory drops from
    # O(B·N·D) (the gathered block) to O(B·n_loc·(D+k)) — the knob for
    # events larger than one chip's memory.  Ignored off-mesh.
    ring_knn: bool = False
    # Between reduction rounds, COMPACT the pooled node set: after
    # cluster-max pooling only ~55-60% of slots hold representatives, yet
    # the next round's graph build is O(N²) in the PADDED size.  Gather
    # survivors (ascending index — order-preserving, so index tie-breaks
    # are unchanged) into the front 3N/4 slots and shrink every round-2
    # tensor.  Exact up to float re-association whenever representatives
    # fit (matching leaves ≥50% only if under half the nodes pair — with
    # 4 handshake rounds that does not happen in practice); overflow
    # drops the highest-index representatives (deterministic, documented).
    compact_pool: bool = True
    # Multiplier from network output units to GeV.  MET is O(10²) GeV while
    # the head sees O(1) activations and AdamW moves weights ~lr per step —
    # without this scale the head needs O(scale/lr) steps just to reach the
    # target's magnitude.  Set it to the training set's mean |genMET|
    # (cli/train.py does this automatically).
    output_scale: float = 1.0


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Optimizer + LR schedule (reference train.py:75-76)."""

    lr: float = 1e-3
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 0.01           # torch AdamW default, confirmed in ckpt
    plateau_factor: float = 0.5
    plateau_patience: int = 500
    plateau_threshold: float = 0.05      # relative, mode 'min'
    # Global-norm gradient clipping.  None (default) = off, matching the
    # reference exactly (train.py:51-52 has no clipping — and exhibits the
    # same late-training loss blow-ups our parity runs reproduce); set to
    # e.g. 10.0 to stabilize long runs.
    grad_clip_norm: Optional[float] = None


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset / batching (reference train.py:66, model/data_loader.py:92-111)."""

    batch_size: int = 6
    validation_split: float = 0.2
    seed: int = 42
    clip_value: float = 5000.0           # model/data_loader.py:82
    pad_fill: float = -999.0             # ETL padding sentinel
    # Padded-node capacity buckets: each batch is padded to the smallest
    # bucket >= its largest event, keeping the number of distinct compiled
    # shapes tiny.
    node_buckets: Tuple[int, ...] = (128, 256, 512, 1024, 2048, 4096, 8192)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    epochs: int = 100                    # reference train.py:100 (range 1..101)
    eval_batch_size: int = 40            # reference evaluate.py:176
    # "Precise BN": before each validation pass, re-estimate BatchNorm
    # running statistics with N forward passes over training batches
    # (params untouched).  0 = off (reference parity).  Matters for the
    # DRN, whose BatchNorm runs over *edge messages* of per-round dynamic
    # graphs — a distribution that shifts too fast for momentum-0.1
    # running stats, making raw eval losses erratic.
    bn_refresh_batches: int = 0
    # Multi-step chained device programs: stack up to this many
    # consecutive same-shape batches and run them as ONE compiled program
    # (lax.scan over the stack, train/chain.py) — one dispatch + one
    # scalar fetch per chain instead of per step.  Bit-identical loss
    # trajectory (tests/test_chain.py).  1 = dispatch per step (the
    # reference's structure, train.py:39-54).  Applies to single-device
    # and data-parallel training; node-sharded (EP) steps stay per-step.
    chain_steps: int = 8
    # Device-resident epoch feed (train/resident.py): stage the memoized
    # collated epoch into HBM once and replay it every epoch — zero
    # host->device staging after epoch 1 (the measured feed bound,
    # BENCH_r04: 366.6 fed vs 5,376 compiled events/s).  Sound because
    # the loaders are deterministic and unshuffled (reference
    # model/data_loader.py:108-109).  Falls back to streaming when the
    # epoch exceeds the HBM budget; single-process runs only.
    resident_feed: bool = True
    qt_max: float = 400.0                # evaluate.py:111-112
    qt_bin_width: float = 10.0
    qt_hist_bins: int = 40
    # Compute dtype. float32 throughout: the hot kernel is VPU-bound and
    # v5e VPU has no bf16 throughput advantage (measured: bf16 values were
    # ~5 % SLOWER due to conversions), while the MXU GEMMs here are <2 %
    # of step time — so bf16 would cost precision for nothing.
    dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for the distribution layer."""

    data_axis: str = "data"
    node_axis: str = "node"              # graph/node partition axis
    data_parallel: int = -1              # -1 => all devices on data axis
    node_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    graph: GraphConfig = dataclasses.field(default_factory=GraphConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    drn: DRNConfig = dataclasses.field(default_factory=DRNConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "Config":
        raw = json.loads(s)
        sub = {
            "graph": GraphConfig, "model": ModelConfig, "drn": DRNConfig,
            "optim": OptimConfig, "data": DataConfig, "train": TrainConfig,
            "mesh": MeshConfig,
        }
        kwargs = {}
        for key, cls in sub.items():
            if key in raw:
                d = {k: (tuple(v) if isinstance(v, list) else v)
                     for k, v in raw[key].items()}
                kwargs[key] = cls(**d)
        return Config(**kwargs)
