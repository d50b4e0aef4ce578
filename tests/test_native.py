"""Native C++ library tests: lz4 codec, xxh32, event packer."""

import numpy as np
import pytest

from deepmetv2_tpu.data import ingest, synthetic_events
from deepmetv2_tpu.data.synthetic import synthetic_npz
from deepmetv2_tpu.utils import artifacts, lz4f, native

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native lib not built")


@needs_native
class TestXxh32:
    def test_matches_python(self):
        for data in [b"", b"a", b"hello world", bytes(range(256)) * 7]:
            assert native.xxh32(data) == lz4f.xxh32(data)

    def test_known_vector(self):
        # xxh32("") seed 0 = 0x02cc5d05 (published test vector)
        assert native.xxh32(b"") == 0x02CC5D05


@needs_native
class TestLz4Codec:
    def test_roundtrip_native_compress_python_decompress(self):
        rng = np.random.default_rng(0)
        # compressible data
        data = (b"the quick brown fox " * 500
                + rng.integers(0, 4, 1000, dtype=np.uint8).tobytes())
        comp = native.lz4_compress_block(data)
        assert comp is not None and len(comp) < len(data)
        # python block decoder must agree
        assert lz4f._decompress_block_py(comp) == data
        # native decoder too
        assert lz4f.decompress_block(comp) == data

    def test_incompressible(self):
        rng = np.random.default_rng(1)
        data = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
        comp = native.lz4_compress_block(data)
        if comp is not None:  # may be slightly larger; roundtrip still holds
            assert lz4f._decompress_block_py(comp) == data

    def test_frame_roundtrip_with_native_compression(self):
        obj = {"hists": np.arange(10000, dtype=np.float64),
               "label": "x" * 5000}
        import tempfile, os.path as osp
        with tempfile.TemporaryDirectory() as d:
            p = osp.join(d, "a.resolutions")
            artifacts.save(obj, p)
            back = artifacts.load(p)
            np.testing.assert_array_equal(back["hists"], obj["hists"])
            assert back["label"] == obj["label"]
            # frame with native compression should beat uncompressed payload
            import pickle
            raw_len = len(pickle.dumps(obj))
            comp_len = osp.getsize(p)
            assert comp_len < raw_len

    def test_reads_reference_artifact(self):
        import os.path as osp
        ref = "/root/reference/ckpts_dytt/best.resolutions"
        if not osp.exists(ref):
            pytest.skip("reference artifact absent")
        res = artifacts.load(ref)
        assert "MET" in res and "u_perp_resolution" in res["MET"]


@needs_native
class TestEventPacker:
    def test_matches_numpy_path(self, tmp_path):
        p = str(tmp_path / "slice.npz")
        synthetic_npz(p, n_events=6, seed=11)
        with np.load(p) as f:
            xs = np.asarray(f["x"], np.float32)
        out, lengths = native.pack_events(xs)
        for e in range(6):
            want = ingest.event_from_raw(xs[:, e, :])
            got = out[e, : lengths[e]]
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_nan_and_clip_semantics(self):
        raw = np.zeros((12, 1, 3), np.float32)
        raw[0, 0] = [1e9, 2.0, 3.0]        # pt (clipped via px/pt)
        raw[4, 0] = [np.nan, 0.0, 0.0]     # dz nan -> 0
        raw[7, 0] = [211, -999, 22]        # middle row dropped
        raw[8, 0] = [1, -999, 0]
        out, lengths = native.pack_events(raw)
        assert lengths[0] == 2
        assert out[0, 0, 2] == 5000.0       # pt clipped
        assert out[0, 0, 5] == 0.0          # nan dz -> 0
        assert out[0, 1, 8] == 22           # third row survives
