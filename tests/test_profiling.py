"""Observability utilities + determinism guarantees."""

import numpy as np
import jax
import jax.numpy as jnp

from deepmetv2_tpu.utils.profiling import StepProfiler
from deepmetv2_tpu.ops.segment import masked_sum
from deepmetv2_tpu.ops.window import WindowGraph, window_edgeconv_linear


class TestStepProfiler:
    def test_summary(self):
        p = StepProfiler(n_chips=2)
        for _ in range(5):
            p.step_start()
            p.step_end(num_edges=1000)
        s = p.summary()
        assert s["steps"] == 4  # warmup skipped
        assert s["edges_per_s_per_chip"] > 0
        assert s["p99_step_ms"] >= s["p50_step_ms"]


class TestDeterminism:
    def test_segment_sum_is_deterministic(self):
        """Masked reductions must be bit-identical across runs (the
        scatter-free layout removes atomic-add nondeterminism that the
        reference's CUDA scatter_add has)."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 257)).astype(np.float32))
        mask = jnp.asarray(rng.random((4, 257)) < 0.7)
        f = jax.jit(lambda x: masked_sum(x, mask, axis=1))
        a = np.asarray(f(x))
        for _ in range(3):
            np.testing.assert_array_equal(a, np.asarray(f(x)))

    def test_window_edgeconv_is_deterministic(self):
        rng = np.random.default_rng(1)
        B, N, H = 2, 128, 8
        x = jnp.asarray(rng.normal(size=(B, N, H)).astype(np.float32))
        pos = jnp.asarray(rng.normal(size=(B, N, 2)).astype(np.float32))
        mask = jnp.ones((B, N), bool)
        w = jnp.asarray(rng.normal(size=(2 * H, H)).astype(np.float32))
        g = WindowGraph(pos, mask, r=0.6, halo=64)
        f = jax.jit(lambda x: window_edgeconv_linear(x, g, w, None))
        a = np.asarray(f(x))
        for _ in range(3):
            np.testing.assert_array_equal(a, np.asarray(f(x)))
