"""Test configuration: force an 8-device CPU mesh so multi-chip sharding
logic is exercised without TPU hardware.

The host image's sitecustomize imports jax (registering the axon TPU
plugin) at interpreter startup, and jax binds JAX_PLATFORMS at import
time — so setting os.environ here is NOT enough. ``jax.config.update``
before the first backend initialization is what actually selects the
platform; XLA_FLAGS is read by the CPU client at backend init and must be
set before that point too."""
import os

# BDE_TESTS_TPU=1 opts OUT of the CPU mesh: the suite then runs on the
# real chip so the @requires_tpu lanes (hardware PRNG, Pallas kernels)
# execute instead of skipping. Default stays the hermetic 8-CPU mesh.
_ON_TPU = os.environ.get("BDE_TESTS_TPU") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not _ON_TPU and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the e2e tests' conv-net programs dominate
# suite wall time on this single-core host; caching makes re-runs cheap.
try:
    from beyond_deep_ensembles_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass

if not _ON_TPU:
    assert jax.device_count() == 8, (
        f"expected the 8-device virtual CPU mesh, got {jax.devices()} — "
        "was a backend initialized before conftest?"
    )
