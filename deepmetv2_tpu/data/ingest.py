"""NPZ ingest — semantics of ``METDataset.process``.

The reference converts ETL npz slices (``[12, n_events, n_max]`` padded
feature blocks) into one PyG ``Data`` per event
(reference model/data_loader.py:63-90):

* raw feature order: pt, eta, phi, d0, dz, mass, puppiWeight, pdgId, charge,
  fromPV, pvRef, pvAssocQuality;
* derived order: px, py, pt, eta, d0, dz, mass, puppiWeight, pdgId, charge,
  fromPV  (px = pt·cos phi, py = pt·sin phi);
* rows with pdgId == -999 or charge == -999 (ETL pad fill) are dropped;
* nan_to_num then clip to ±5000.

We keep the exact same contract but emit numpy arrays (no per-event .pt
files): ingest is a pure host-side transform feeding the bucketed batcher.
The hot inner loop optionally dispatches to the native C++ packer
(deepmetv2_tpu.utils.native) when built.
"""

from __future__ import annotations

import glob
import os.path as osp
from typing import Iterator, List, Sequence, Tuple

import numpy as np

RAW_PT, RAW_ETA, RAW_PHI = 0, 1, 2
RAW_D0, RAW_DZ, RAW_MASS, RAW_PUPPI = 3, 4, 5, 6
RAW_PDGID, RAW_CHARGE, RAW_FROMPV = 7, 8, 9

CLIP = 5000.0
PAD_FILL = -999.0


def event_from_raw(raw: np.ndarray, clip: float = CLIP) -> np.ndarray:
    """Transform one raw event ``[12, n_max]`` (features-first, the ETL slice
    layout) into the 11-feature layout, dropping pad rows.

    Mirrors reference model/data_loader.py:68-83.
    """
    raw = np.asarray(raw, dtype=np.float32)
    assert raw.shape[0] == 12, f"expected [12, n] raw event, got {raw.shape}"
    raw = raw.T  # [n_max, 12]

    # Derived 11-feature layout.
    pt, eta, phi = raw[:, RAW_PT], raw[:, RAW_ETA], raw[:, RAW_PHI]
    x = np.empty((raw.shape[0], 11), dtype=np.float32)
    x[:, 0] = pt * np.cos(phi)   # px
    x[:, 1] = pt * np.sin(phi)   # py
    x[:, 2] = pt
    x[:, 3] = eta
    x[:, 4:11] = raw[:, RAW_D0:RAW_FROMPV + 1]  # d0,dz,mass,puppi,pdg,charge,fromPV

    # Drop ETL padding rows (pdgId / charge == -999).
    keep = (x[:, 8] != PAD_FILL) & (x[:, 9] != PAD_FILL)
    x = x[keep]

    x = np.nan_to_num(x)
    np.clip(x, -clip, clip, out=x)
    return x


def load_npz_events(path: str) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield ``(x [n, 11], y [T])`` for each event in one npz slice file.

    npz layout per the ETL (reference data_znunu/generate_npz.py:131-146):
    ``x``: [12, n_events, n_max]; ``y``: [n_events, T].  The per-event
    transform runs in the native C++ packer when built (whole slice at
    once), else the numpy fallback.
    """
    with np.load(path, allow_pickle=True) as f:
        xs = np.asarray(f["x"], dtype=np.float32)
        ys = np.asarray(f["y"], dtype=np.float32)
    n_events = xs.shape[1]

    try:
        from deepmetv2_tpu.utils import native

        packed = native.pack_events(xs, clip=CLIP)
    except Exception:
        packed = None

    if packed is not None:
        out, lengths = packed
        for ievt in range(n_events):
            yield out[ievt, : lengths[ievt]].copy(), ys[ievt, :]
        return

    for ievt in range(n_events):
        x = event_from_raw(xs[:, ievt, :])
        yield x, ys[ievt, :]


def discover_npz(data_dir: str) -> List[str]:
    """Sorted list of raw npz slice files (reference
    model/data_loader.py:30-34 globs ``raw/*.npz``)."""
    raw_dir = osp.join(data_dir, "raw")
    if osp.isdir(raw_dir):
        return sorted(glob.glob(osp.join(raw_dir, "*.npz")))
    return sorted(glob.glob(osp.join(data_dir, "*.npz")))
