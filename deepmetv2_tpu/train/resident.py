"""Device-resident epoch feed — the epoch lives in HBM, not on the host.

The reference re-stages every batch onto the accelerator every epoch
(reference train.py:39-41: ``for data in dataloader: data.to(device)``),
so its epoch rate is bounded by host->device bandwidth.  Measured here
(BENCH_r04): the compiled train step sustains 5,376 events/s but a fed
epoch only 366.6 — per-batch staging through the host link is ~15x the
compute cost, and chaining dispatches (train/chain.py) cannot help
because staging, not dispatch, is the bound (chained k=8 == chained
k=full at 366.6 events/s).

The loaders are deterministic and unshuffled (reference
model/data_loader.py:108-109: ``shuffle=False``; data/loader.PaddedLoader
memoizes its collated epoch), so every epoch feeds *identical* batches.
That makes the whole epoch a constant — and a constant belongs in device
memory.  :class:`ResidentFeed` stacks consecutive same-shape batches into
chained pytrees (train/chain.chain_batches), stages each stack into HBM
ONCE, and replays the same device arrays every epoch.  After epoch 1 the
only host<->device traffic is one loss fetch per epoch.

The collated dataset is small — ``[B, N, 11]`` float32 plus masks, tens
of MB for the reference-scale datasets — so pinning it in HBM (16 GB on
v5e) is free.  ``max_bytes`` guards the pathological case: a dataset that
would not fit falls back to streaming (per-epoch staging) with a warning
rather than OOMing the device.
"""

from __future__ import annotations

from typing import Callable, Iterator, List, Optional

import numpy as np

from deepmetv2_tpu.train.chain import chain_batches


def _nbytes(tree) -> int:
    import jax

    return sum(np.asarray(l).nbytes for l in jax.tree_util.tree_leaves(tree))


class ResidentFeed:
    """Replay an epoch of (optionally chained) batches from device memory.

    Parameters:
      loader: an iterable of host ``EventBatch``es (data/loader.PaddedLoader
        or any deterministic batch source).  Must yield the same batches
        every iteration — true for the memoizing loaders here; a shuffling
        loader must NOT be wrapped (epoch order would silently freeze).
      chain: stack up to this many consecutive same-shape batches per
        device program (1 = per-step batches, no stacking).
      place: device placement for one stacked pytree — ``jax.device_put``
        (default) for single-device, or a sharded placement (e.g. the
        chained data-parallel ``place_chain`` in train/loop.fit) for mesh
        training.  Applied ONCE per stack, on first iteration.
      max_bytes: HBM budget for the staged epoch; a larger epoch streams
        from the host instead (with a one-time warning).
    """

    def __init__(self, loader, chain: int = 1,
                 place: Optional[Callable] = None,
                 max_bytes: int = 4 << 30):
        self._loader = loader
        self._chain = max(1, int(chain))
        self._place = place
        self._max_bytes = max_bytes
        self._stacks: Optional[List] = None
        self._streaming = False
        #: per-stack (n_steps, n_valid_nodes) computed host-side at staging
        #: time — progress accounting must never read staged device arrays
        #: back (a D2H round-trip per step through a remote-device tunnel).
        self.meta: List[tuple] = []

    def _host_stacks(self) -> Iterator:
        yield from chain_batches(iter(self._loader), self._chain)

    def _stage(self):
        import jax

        place = self._place if self._place is not None else jax.device_put
        stacks, meta, total = [], [], 0
        for s in self._host_stacks():
            total += _nbytes(s)
            if total > self._max_bytes:
                import warnings

                warnings.warn(
                    f"ResidentFeed: epoch exceeds max_bytes "
                    f"({total} > {self._max_bytes}); streaming from host")
                self._streaming = True
                self.meta = []
                return
            k = (np.asarray(jax.tree_util.tree_leaves(s)[0]).shape[0]
                 if self._chain > 1 else 1)
            meta.append((k, int(np.sum(np.asarray(s.num_valid)))))
            stacks.append(place(s))
        self._stacks = stacks
        self.meta = meta

    def __iter__(self):
        if self._streaming:
            from deepmetv2_tpu.data.loader import prefetch_to_device

            yield from prefetch_to_device(self._host_stacks(),
                                          place=self._place)
            return
        if self._stacks is None:
            self._stage()
            if self._streaming:          # staging bailed on max_bytes
                yield from iter(self)
                return
        yield from self._stacks

    def __len__(self) -> int:
        if self._stacks is not None:
            return len(self._stacks)
        return sum(1 for _ in self._host_stacks())

    def nbytes(self) -> int:
        """Bytes pinned in device memory (0 until staged / if streaming)."""
        return sum(_nbytes(s) for s in (self._stacks or []))
