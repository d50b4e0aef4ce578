"""Synthetic particle-flow event generator.

The reference ships no raw data (ETL reads CMS NanoAOD over xrootd,
reference data_znunu/generate_npz.py:101).  This generator produces
physically-shaped events with the exact ingest contract — same 11-feature
layout, same target vector layout — so the full train/eval stack and all
benchmarks run hermetically.

The generative model makes the learning problem real: each event has a
"hard-scatter" subset (fromPV==3, puppiWeight ~ 1) whose negative vector sum
is genMET, diluted with pileup candidates (fromPV<3, puppiWeight ~ 0) that
must be down-weighted — precisely the structure the GraphMET weights w_i are
trained to discover (reference model/net.py:49-62).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

# |pdgId| classes (reference model/graph_met_network.py:45) with charges.
_PDG_CHOICES = np.array([11, 13, 22, 130, 211, 1, 2], dtype=np.int32)
_PDG_CHARGED = np.array([1, 1, 0, 0, 1, 0, 0], dtype=np.int32)
_PDG_PROBS = np.array([0.02, 0.02, 0.25, 0.13, 0.50, 0.04, 0.04])


def synthetic_events(
    n_events: int,
    seed: int = 0,
    n_min: int = 50,
    n_max: int = 1500,
    target_dim: int = 11,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Generate ``n_events`` events as ``(x [n, 11], y [target_dim])``.

    y layout mirrors the ETL (reference data_dytt/generate_npz.py:95-107):
    [genMETx, genMETy, pfMETx, pfMETy, puppiMETx, puppiMETy,
     deepRespMETx, deepRespMETy, deepResoMETx, deepResoMETy, HT].
    """
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_events):
        n = int(rng.integers(n_min, n_max + 1))

        pt = rng.pareto(2.5, size=n).astype(np.float32) * 2.0 + 0.3
        eta = rng.uniform(-5.0, 5.0, size=n).astype(np.float32)
        phi = rng.uniform(-np.pi, np.pi, size=n).astype(np.float32)

        cls = rng.choice(len(_PDG_CHOICES), size=n, p=_PDG_PROBS)
        pdg = _PDG_CHOICES[cls] * rng.choice([-1, 1], size=n)
        charged = _PDG_CHARGED[cls]
        charge = (charged * rng.choice([-1, 1], size=n)).astype(np.int32)

        # Hard-scatter vs pileup: ~35% of candidates from the primary vertex.
        is_hs = rng.random(n) < 0.35
        from_pv = np.where(is_hs, 3, rng.integers(0, 3, size=n)).astype(np.int32)
        puppi = np.clip(
            np.where(is_hs, rng.normal(0.95, 0.05, n), rng.normal(0.05, 0.05, n)),
            0.0, 1.0,
        ).astype(np.float32)

        d0 = rng.normal(0.0, np.where(is_hs, 0.01, 0.1), n).astype(np.float32)
        dz = rng.normal(0.0, np.where(is_hs, 0.02, 5.0), n).astype(np.float32)
        mass = np.where(np.abs(pdg) == 211, 0.13957,
                        np.where(np.abs(pdg) == 130, 0.49761, 0.0)).astype(np.float32)

        px = pt * np.cos(phi)
        py = pt * np.sin(phi)

        x = np.stack(
            [px, py, pt, eta, d0, dz, mass, puppi,
             pdg.astype(np.float32), charge.astype(np.float32),
             from_pv.astype(np.float32)],
            axis=1,
        ).astype(np.float32)

        # genMET balances the hard-scatter system (plus detector smearing).
        hs_px = float(np.sum(px[is_hs]))
        hs_py = float(np.sum(py[is_hs]))
        gen = np.array([-hs_px, -hs_py]) + rng.normal(0, 1.0, 2)

        y = np.zeros((target_dim,), dtype=np.float32)
        # Loss convention (reference model/net.py:60): loss uses (MET + y)²
        # with MET = Σ w p, i.e. y stores the *negated* target recoil: the
        # ETL writes MET-px directly, so y[0:2] = genMET components.
        y[0:2] = gen
        if target_dim >= 6:
            y[2:4] = gen + rng.normal(0, 12.0, 2)   # pfMET: poor resolution
            y[4:6] = gen + rng.normal(0, 7.0, 2)    # puppiMET
        if target_dim >= 10:
            y[6:8] = gen + rng.normal(0, 5.0, 2)    # DeepMETResponse
            y[8:10] = gen + rng.normal(0, 4.5, 2)   # DeepMETResolution
        if target_dim >= 11:
            y[10] = float(np.sum(pt[is_hs]))        # LHE HT proxy
        out.append((x, y))
    return out


def synthetic_npz(path: str, n_events: int, seed: int = 0, n_max_pad: int = 1600) -> None:
    """Write events in the ETL npz slice format
    (x: [12, n_events, n_max] with -999 padding; y: [n_events, 11]),
    so the full ingest path (ingest.load_npz_events) is exercised."""
    events = synthetic_events(n_events, seed=seed, n_max=min(1500, n_max_pad - 1))
    xs = np.full((12, n_events, n_max_pad), -999.0, dtype=np.float32)
    ys = np.zeros((n_events, 11), dtype=np.float32)
    for i, (x, y) in enumerate(events):
        n = x.shape[0]
        # Re-encode to raw ETL order: pt, eta, phi, d0, dz, mass, puppi,
        # pdgId, charge, fromPV, pvRef, pvAssocQuality.
        phi = np.arctan2(x[:, 1], x[:, 0])
        xs[0, i, :n] = x[:, 2]          # pt
        xs[1, i, :n] = x[:, 3]          # eta
        xs[2, i, :n] = phi
        xs[3, i, :n] = x[:, 4]          # d0
        xs[4, i, :n] = x[:, 5]          # dz
        xs[5, i, :n] = x[:, 6]          # mass
        xs[6, i, :n] = x[:, 7]          # puppiWeight
        xs[7, i, :n] = x[:, 8]          # pdgId
        xs[8, i, :n] = x[:, 9]          # charge
        xs[9, i, :n] = x[:, 10]         # fromPV
        xs[10, i, :n] = 0.0             # pvRef (unused downstream)
        xs[11, i, :n] = 7.0             # pvAssocQuality (unused downstream)
        ys[i] = y
    np.savez_compressed(path, x=xs, y=ys)
