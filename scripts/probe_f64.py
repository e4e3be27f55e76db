"""Probe float64 support/perf on the axon TPU backend.

Decides the implementation of VERDICT item 4 (recover the 2D-1 Cl band
on-chip): if XLA:TPU emulates f64 at usable speed, the force integral
(and optionally residual refinement) can run in f64 islands; otherwise
fall back to compensated (two-float) fp32 arithmetic.
"""
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

dev = jax.devices()[0]
print("device:", dev.platform, dev.device_kind, flush=True)

# dtype preservation
x = jnp.asarray(np.array([1.0 + 1e-12, 2.0], np.float64))
print("dtype on device:", x.dtype, flush=True)

# correctness beyond fp32: 1 + 1e-12 must survive
y = jax.jit(lambda a: (a[0] - 1.0) * 1e12)(x)
print("(1+1e-12 - 1)*1e12 =", float(y), "(want ~1.0)", flush=True)

# cancellation test like the lift integral: sum of O(1) values canceling
# to 1e-6
rng = np.random.default_rng(0)
n = 200_000
big = rng.standard_normal(n)
small = rng.standard_normal(n) * 1e-6
host = (big - big + small).sum()          # exact-ish reference

a64 = jnp.asarray(big + small)
b64 = jnp.asarray(big)


@jax.jit
def canc(a, b):
    return (a - b).sum()


print("cancel f64:", float(canc(a64, b64)), "ref:", host, flush=True)
a32, b32 = a64.astype(jnp.float32), b64.astype(jnp.float32)
print("cancel f32:", float(canc(a32, b32)), flush=True)

# speed: elementwise + reduce on 4M f64 vs f32
m = 4_000_000
v64 = jnp.asarray(rng.standard_normal(m))
v32 = v64.astype(jnp.float32)


@jax.jit
def work(v):
    return (v * 1.000001 + 0.5).sum()


for name, v in [("f64", v64), ("f32", v32)]:
    work(v).block_until_ready()
    t0 = time.time()
    for _ in range(20):
        r = work(v)
    r.block_until_ready()
    print(f"{name}: {(time.time()-t0)/20*1e3:.2f} ms per 4M elem+reduce",
          flush=True)

# matmul in f64 (MXU has no f64; check emulation path exists)
A = jnp.asarray(rng.standard_normal((512, 512)))
B = jnp.asarray(rng.standard_normal((512, 512)))
C = jax.jit(jnp.matmul)(A, B)
ref = np.asarray(A, np.float64) @ np.asarray(B, np.float64)
print("matmul f64 err:", float(np.abs(np.asarray(C) - ref).max()),
      "dtype:", C.dtype, flush=True)
