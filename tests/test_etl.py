"""ETL tests: delta-R machinery, selections, overlap removal, padding,
end-to-end slice generation feeding the training ingest."""

import numpy as np
import pytest

from deepmetv2_tpu.data import METDataset, ingest
from deepmetv2_tpu.etl import common
from deepmetv2_tpu.etl.dytt import (
    process_chunk_dytt,
    select_tight_electrons,
    select_tight_muons,
)
from deepmetv2_tpu.etl.znunu import process_chunk_znunu


def _fake_chunk(rng, n_events=5, with_leptons=True, n_pf=(20, 60)):
    """Synthetic NanoAOD-shaped chunk (see etl/common.py data model)."""
    pf = {f: [] for f in common.PF_FIELDS}
    for _ in range(n_events):
        n = int(rng.integers(*n_pf))
        pf["pt"].append(rng.pareto(2, n).astype(np.float32) + 0.2)
        pf["eta"].append(rng.uniform(-5, 5, n).astype(np.float32))
        pf["phi"].append(rng.uniform(-np.pi, np.pi, n).astype(np.float32))
        for f in ["d0", "dz", "mass"]:
            pf[f].append(rng.normal(0, 1, n).astype(np.float32))
        pf["puppiWeight"].append(rng.random(n).astype(np.float32))
        pf["pdgId"].append(rng.choice([211, -211, 22, 130, 11], n))
        pf["charge"].append(rng.choice([-1, 0, 1], n))
        pf["fromPV"].append(rng.integers(0, 4, n))
        pf["pvRef"].append(np.zeros(n, np.float32))
        pf["pvAssocQuality"].append(np.full(n, 7, np.float32))

    chunk = {"PFCands": pf,
             "LHE": {"HT": rng.uniform(100, 800, n_events).astype(np.float32)}}
    for coll in ["GenMET", "MET", "PuppiMET", "DeepMETResponseTune",
                 "DeepMETResolutionTune"]:
        chunk[coll] = {"pt": rng.uniform(0, 200, n_events).astype(np.float32),
                       "phi": rng.uniform(-np.pi, np.pi, n_events).astype(np.float32)}
    if with_leptons:
        chunk["Muon"] = {"pt": [], "eta": [], "phi": [], "tightId": [],
                         "pfRelIso03_all": []}
        chunk["Electron"] = {"pt": [], "eta": [], "phi": [],
                             "mvaFall17V1Iso_WP80": []}
        for e in range(n_events):
            nm = 2
            chunk["Muon"]["pt"].append(np.array([35.0, 28.0], np.float32))
            chunk["Muon"]["eta"].append(rng.uniform(-2.4, 2.4, nm).astype(np.float32))
            chunk["Muon"]["phi"].append(rng.uniform(-np.pi, np.pi, nm).astype(np.float32))
            chunk["Muon"]["tightId"].append(np.ones(nm, np.int32))
            chunk["Muon"]["pfRelIso03_all"].append(np.full(nm, 0.05, np.float32))
            chunk["Electron"]["pt"].append(np.zeros(0, np.float32))
            chunk["Electron"]["eta"].append(np.zeros(0, np.float32))
            chunk["Electron"]["phi"].append(np.zeros(0, np.float32))
            chunk["Electron"]["mvaFall17V1Iso_WP80"].append(np.zeros(0, np.int32))
    return chunk


class TestDeltaR:
    def test_phi_wraparound(self):
        # ETL delta_r wraps phi (unlike the training radius graph)
        dp = common.delta_phi(np.array([np.pi - 0.05]), np.array([-np.pi + 0.05]))
        assert np.isclose(abs(dp[0]), 0.1, atol=1e-6)
        dr = common.delta_r(np.array([0.0]), np.array([np.pi - 0.05]),
                            np.array([0.0]), np.array([-np.pi + 0.05]))
        assert np.isclose(dr[0], 0.1, atol=1e-6)


class TestOverlapRemoval:
    def test_removes_closest_only(self):
        pf_eta = np.array([0.0, 0.0005, 1.0])
        pf_phi = np.array([0.0, 0.0, 0.0])
        lep_eta = np.array([0.0004])
        lep_phi = np.array([0.0])
        keep = common.overlap_removal_mask(pf_eta, pf_phi, lep_eta, lep_phi)
        # closest is pf[1] (dr=1e-4 < 1e-3): dropped; pf[0] kept though also
        # within radius (unique matching drops only the argmin)
        np.testing.assert_array_equal(keep, [True, False, True])

    def test_no_removal_outside_radius(self):
        keep = common.overlap_removal_mask(
            np.array([0.0]), np.array([0.0]), np.array([0.5]), np.array([0.0]))
        np.testing.assert_array_equal(keep, [True])


class TestSelections:
    def test_tight_muon(self):
        mu = {"tightId": np.array([1, 1, 0, 1]),
              "pfRelIso03_all": np.array([0.05, 0.3, 0.05, 0.05]),
              "pt": np.array([25.0, 25.0, 25.0, 15.0])}
        np.testing.assert_array_equal(select_tight_muons(mu),
                                      [True, False, False, False])

    def test_tight_electron(self):
        el = {"mvaFall17V1Iso_WP80": np.array([1, 0, 1]),
              "pt": np.array([30.0, 30.0, 10.0])}
        np.testing.assert_array_equal(select_tight_electrons(el),
                                      [True, False, False])


class TestZnunu:
    def test_targets_and_padding(self):
        rng = np.random.default_rng(0)
        chunk = _fake_chunk(rng, n_events=4, with_leptons=False)
        x, y = process_chunk_znunu(chunk)
        assert x.shape[0] == 12 and x.shape[1] == 4
        assert y.shape == (4, 11)
        for e in range(4):
            pt, phi = chunk["GenMET"]["pt"][e], chunk["GenMET"]["phi"][e]
            assert np.isclose(y[e, 0], pt * np.cos(phi), rtol=1e-5)
            assert np.isclose(y[e, 1], pt * np.sin(phi), rtol=1e-5)
            n = len(chunk["PFCands"]["pt"][e])
            assert np.all(x[0, e, :n] == chunk["PFCands"]["pt"][e])
            assert np.all(x[:, e, n:] == -999.0)


class TestDytt:
    def test_recoil_correction_and_removal(self):
        rng = np.random.default_rng(1)
        chunk = _fake_chunk(rng, n_events=3, with_leptons=True)
        # plant a PF candidate exactly on top of the leading muon in event 0
        m_eta = chunk["Muon"]["eta"][0][0]
        m_phi = chunk["Muon"]["phi"][0][0]
        chunk["PFCands"]["eta"][0][0] = m_eta + 1e-5
        chunk["PFCands"]["phi"][0][0] = m_phi
        n_before = len(chunk["PFCands"]["pt"][0])

        x, y = process_chunk_dytt(chunk, n_leptons=2, n_leptons_subtract=2)
        assert y.shape == (3, 11)
        # recoil correction: y0 = genMETx + sum lepton px
        lep_px = np.sum(chunk["Muon"]["pt"][0] * np.cos(chunk["Muon"]["phi"][0]))
        want = (chunk["GenMET"]["pt"][0] * np.cos(chunk["GenMET"]["phi"][0])
                + lep_px)
        assert np.isclose(y[0, 0], want, rtol=1e-5)
        # overlap removal dropped the planted candidate
        n_after = int(np.sum(x[7, 0] != -999.0))
        assert n_after == n_before - 1

    def test_lepton_count_cut(self):
        rng = np.random.default_rng(2)
        chunk = _fake_chunk(rng, n_events=2, with_leptons=True)
        chunk["Muon"]["tightId"][1] = np.zeros(2, np.int32)  # fails cut
        x, y = process_chunk_dytt(chunk, n_leptons=2)
        assert y.shape[0] == 1


class TestEndToEnd:
    def test_etl_slice_feeds_training_ingest(self, tmp_path):
        rng = np.random.default_rng(3)
        chunk = _fake_chunk(rng, n_events=5, with_leptons=False)
        x, y = process_chunk_znunu(chunk)
        raw = tmp_path / "raw"
        raw.mkdir()
        common.save_slice(str(raw / "s_file0_slice_0_nevent_5"), x, y)
        ds = METDataset(data_dir=str(tmp_path))
        assert len(ds) == 5
        ev_x, ev_y = ds[0]
        assert ev_x.shape[1] == 11
        assert ev_y.shape[0] == 11
        # px derived from pt, phi
        n = len(chunk["PFCands"]["pt"][0])
        assert ev_x.shape[0] == n
        np.testing.assert_allclose(
            ev_x[:, 0],
            np.clip(np.nan_to_num(chunk["PFCands"]["pt"][0]
                                  * np.cos(chunk["PFCands"]["phi"][0])),
                    -5000, 5000),
            rtol=1e-5)
