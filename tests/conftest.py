"""Test harness config: run everything on an 8-device virtual CPU mesh so
sharding/collective paths are exercised without TPU hardware."""

import os

# Force CPU: the ambient environment points JAX at the (single, remote) TPU
# backend (registered by a sitecustomize hook at interpreter start), so the
# env var alone is not enough — jax.config must be updated post-import.
# Tests run on a local 8-device virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: keeps repeated pytest runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
