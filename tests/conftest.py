"""Test configuration: run JAX on a host-simulated 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; the sharding layer is
exercised on XLA's virtual CPU devices instead (same SPMD partitioner).

Set ``NSTPU_TEST_TPU=1`` to keep the real TPU backend instead: the
CPU-mesh sharding tests then self-skip (they need 8 devices) and the
on-chip benchmark regression guards in tests/test_benchmarks_tpu.py can
run (they additionally gate on NSTPU_TPU_TESTS=1 because they take
10-20 min each).  Invocation in the bench environment:

    NSTPU_TEST_TPU=1 NSTPU_TPU_TESTS=1 PYTHONPATH=/root/repo:/root/.axon_site \
        python -m pytest tests/test_benchmarks_tpu.py -q

NOTE: this environment force-registers an 'axon' TPU backend at interpreter
startup (sitecustomize) and overrides JAX_PLATFORMS — only an explicit
``jax.config.update('jax_platforms', 'cpu')`` reliably selects CPU.
"""

import os

USE_TPU = os.environ.get("NSTPU_TEST_TPU", "") == "1"

if not USE_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
# NOTE: no persistent compilation cache for tests — XLA:CPU AOT entries are
# machine-feature-specific and poison reruns on heterogeneous hosts; true
# CPU compiles of these programs take seconds anyway.
