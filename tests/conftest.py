"""Test configuration: run JAX on a host-simulated 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; the sharding layer is
exercised on XLA's virtual CPU devices instead (same SPMD partitioner).

NOTE: this environment force-registers an 'axon' TPU backend at interpreter
startup (sitecustomize) and overrides JAX_PLATFORMS — only an explicit
``jax.config.update('jax_platforms', 'cpu')`` reliably selects CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent XLA compilation cache: the solver programs are large (nested
# Krylov while-loops); caching makes repeated test runs and multi-instance
# tests cheap.  Programs are value-independent (StepParams as arguments).
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_nstpu_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
