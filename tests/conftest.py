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
# NOTE: no persistent compilation cache for tests — XLA:CPU AOT entries are
# machine-feature-specific and poison reruns on heterogeneous hosts; true
# CPU compiles of these programs take seconds anyway.
