"""Persistent XLA compilation cache for the CLI drivers.

The reference pays a CUDA-extension JIT/warmup cost on every process start;
the TPU analog is XLA compilation (tens of seconds for the largest bucket
shapes).  Enabling JAX's persistent cache makes every re-invocation of a
driver (train / evaluate / plot_weight / bench) reuse previously compiled
executables keyed by (HLO, flags, compiler version).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX at an on-disk compilation cache and return its path.

    Priority: explicit ``path`` > ``DEEPMETV2_TPU_CACHE`` env var >
    ``~/.cache/deepmetv2_tpu/xla``.  Safe to call more than once.
    """
    import jax

    path = (path or os.environ.get("DEEPMETV2_TPU_CACHE")
            or os.path.join(os.path.expanduser("~"), ".cache",
                            "deepmetv2_tpu", "xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
