"""Dataset + loaders — equivalent of ``METDataset`` / ``fetch_dataloader``
(reference model/data_loader.py:21-111), rebuilt for device-friendly feeding.

Differences from the reference, by design:

* no per-event ``.pt`` files — events are ingested once into an in-memory
  list of arrays (collated batches are memoized after the first epoch);
* batches are padded ``EventBatch`` pytrees (see batching.py) instead of
  concatenated ragged graphs;
* two batching modes:
    - ``sequential`` (default): same event order and batch composition as
      the reference (split seed 42, shuffle=False — reference
      model/data_loader.py:103-109), each batch padded to a capacity bucket;
    - ``bucketed``: events grouped by size bucket for maximal padding
      efficiency (throughput mode; changes batch composition).
"""

from __future__ import annotations

import os.path as osp
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from deepmetv2_tpu.data import ingest
from deepmetv2_tpu.data.batching import EventBatch, bucket_for, collate

Event = Tuple[np.ndarray, np.ndarray]


def _torch_random_split_indices(n: int, n_val: int, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """Reproduce torch ``random_split`` under ``torch.manual_seed(seed)``
    (reference model/data_loader.py:103-104) so the train/val partition is
    bit-identical to the reference.  Falls back to numpy if torch is absent.
    """
    try:
        import torch

        torch.manual_seed(seed)
        perm = torch.randperm(n).numpy()
    except Exception:
        perm = np.random.default_rng(seed).permutation(n)
    return perm[: n - n_val], perm[n - n_val:]


class METDataset:
    """In-memory event store (equivalent of reference METDataset,
    model/data_loader.py:21-90)."""

    def __init__(self, data_dir: Optional[str] = None,
                 events: Optional[Sequence[Event]] = None):
        if events is not None:
            self._events: List[Event] = list(events)
        else:
            assert data_dir is not None
            files = ingest.discover_npz(data_dir)
            if not files:
                raise FileNotFoundError(f"no npz slices under {data_dir}")
            self._events = []
            for f in files:
                self._events.extend(ingest.load_npz_events(f))

    def __len__(self) -> int:
        return len(self._events)

    def __getitem__(self, i: int) -> Event:
        return self._events[i]


class PaddedLoader:
    """Iterates EventBatch pytrees over a subset of a dataset."""

    def __init__(
        self,
        dataset: METDataset,
        indices: Sequence[int],
        batch_size: int,
        buckets: Sequence[int],
        mode: str = "sequential",
        pad_batches: bool = True,
        cache: bool = True,
        presort_eta: bool = False,
        presort_mode: str = "eta",
        presort_r: float = 0.4,
    ):
        self.dataset = dataset
        self.indices = np.asarray(indices, dtype=np.int64)
        self.batch_size = batch_size
        self.buckets = tuple(buckets)
        assert mode in ("sequential", "bucketed")
        self.mode = mode
        self.pad_batches = pad_batches
        # Window-mode fast path: spatially sort candidates on the host at
        # collation time (graph.presorted must be set so the compiled steps
        # skip their device argsort — see train/step.build_graph).
        # presort_mode 'eta' = plain eta sort; 'cell' = eta-quantile-block x
        # phi cell order (fastest kernel layout, data/sorting.py).
        assert presort_mode in ("eta", "cell")
        self.presort_eta = presort_eta
        self.presort_mode = presort_mode
        self.presort_r = presort_r
        self._batches = self._plan()
        # The plan and padding are deterministic, so the collated batches
        # can be memoized: epoch 2+ replays pre-built host arrays with zero
        # collation work (the reference re-collates every epoch).
        self._cache: Optional[List[EventBatch]] = [] if cache else None

    def _plan(self) -> List[np.ndarray]:
        bs = self.batch_size
        if self.mode == "sequential":
            return [self.indices[i:i + bs] for i in range(0, len(self.indices), bs)]
        # Bucketed: group indices by event-size bucket, then chunk.  The
        # per-bucket batch lists are interleaved round-robin (deterministic)
        # rather than emitted bucket-by-bucket: a bucket-sorted epoch ends
        # with BatchNorm running statistics biased toward the last bucket's
        # event-size distribution, which makes eval losses erratic.
        by_bucket: Dict[int, List[int]] = {}
        for idx in self.indices:
            n = self.dataset[int(idx)][0].shape[0]
            by_bucket.setdefault(bucket_for(n, self.buckets), []).append(int(idx))
        per_bucket = []
        for _, idxs in sorted(by_bucket.items()):
            per_bucket.append([np.asarray(idxs[i:i + bs], dtype=np.int64)
                               for i in range(0, len(idxs), bs)])
        plans = []
        for i in range(max(len(p) for p in per_bucket) if per_bucket else 0):
            for p in per_bucket:
                if i < len(p):
                    plans.append(p[i])
        return plans

    def __len__(self) -> int:
        return len(self._batches)

    def required_halo(self, r: float) -> int:
        """Smallest window halo valid for every batch this loader yields,
        on the row order it actually emits (sizes the compiled
        graph.window_halo).  Builds the batch cache on first use."""
        from deepmetv2_tpu.data import sorting

        if self._cache is not None and not self._cache and len(self):
            # first use collates (and caches) the full epoch host-side —
            # make the startup latency visible instead of silent
            print(f"sizing window halo: collating {len(self)} batches "
                  f"({len(self.indices)} events) on the host (cached)")
        worst = 0
        for b in self:
            if self.presort_eta and self.presort_mode == "cell":
                worst = max(worst, sorting.required_span_blocks(b, r))
            else:
                # eta order (either presorted, or sorted on device by the
                # step): the eta-sorted span bound applies
                eta = np.asarray(b.x_cont[..., 3])
                worst = max(worst, sorting.required_halo_arrays(
                    eta, np.asarray(b.mask), r))
        return int(worst)

    def __iter__(self) -> Iterator[EventBatch]:
        if self._cache:
            yield from self._cache
            return
        pad_to = self.batch_size if self.pad_batches else None
        built: List[EventBatch] = []
        for batch_idx in self._batches:
            events = [self.dataset[int(i)] for i in batch_idx]
            b = collate(events, buckets=self.buckets, pad_events_to=pad_to)
            if self.presort_eta:
                if self.presort_mode == "cell":
                    from deepmetv2_tpu.data.sorting import cell_sort_batch
                    b = cell_sort_batch(b, r=self.presort_r)
                else:
                    from deepmetv2_tpu.data.sorting import presort_batch
                    b = presort_batch(b)
            built.append(b)
            yield b
        if self._cache is not None:      # publish only complete epochs
            self._cache = built


def prefetch_to_device(it, size: int = 2, place=None):
    """Double-buffered host→device feed (SURVEY.md §2b: "device resident,
    double-buffered host→device feed").

    Placement runs on a worker thread: ``jax.device_put`` is nominally
    asynchronous, but on remote-device backends (and for host numpy
    sources, which must be serialized) it blocks the calling thread — an
    inline deque would stage nothing.  The worker stages batch i+1 while
    the main thread dispatches the step for batch i, so the accelerator
    never waits on the feed.  ``place`` overrides the placement (e.g.
    ``shard_batch`` for mesh training — a later ``device_put`` against the
    same shardings is then a no-op)."""
    import collections
    import concurrent.futures

    import jax

    place = place if place is not None else jax.device_put
    q = collections.deque()
    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
        for b in it:
            q.append(pool.submit(place, b))
            if len(q) >= size:
                yield q.popleft().result()
        while q:
            yield q.popleft().result()


def fetch_dataloader(
    data_dir: Optional[str] = None,
    batch_size: int = 6,
    validation_split: float = 0.2,
    events: Optional[Sequence[Event]] = None,
    seed: int = 42,
    buckets: Sequence[int] = (128, 256, 512, 1024, 2048, 4096, 8192),
    mode: str = "sequential",
    presort_eta: bool = False,
    presort_mode: str = "eta",
    presort_r: float = 0.4,
) -> Dict[str, PaddedLoader]:
    """Equivalent of reference ``fetch_dataloader``
    (model/data_loader.py:92-111): seeded 80/20 random split, sequential
    (unshuffled) batches."""
    dataset = METDataset(data_dir=data_dir, events=events)
    n = len(dataset)
    n_val = int(np.floor(validation_split * n))
    train_idx, val_idx = _torch_random_split_indices(n, n_val, seed)
    kw = dict(presort_eta=presort_eta, presort_mode=presort_mode,
              presort_r=presort_r)
    return {
        "train": PaddedLoader(dataset, train_idx, batch_size, buckets, mode,
                              **kw),
        "test": PaddedLoader(dataset, val_idx, batch_size, buckets, mode,
                             **kw),
    }
