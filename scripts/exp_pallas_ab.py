"""On-chip A/B: fused Pallas F matvec vs the XLA per-component apply.

Builds the 2D bench-scale BSR graph (and optionally the 3D one with
--3d), then times apply_f vs apply_f_fused back-to-back on the real
chip and checks agreement.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_pallas_ab.py [--3d] [h]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from navierstokes_tpu.fem.spaces import TaylorHoodSpace
from navierstokes_tpu.ops import assembly
from navierstokes_tpu.ops.bsr import apply_f, build_bsr
from navierstokes_tpu.ops.pallas_matvec import apply_f_fused

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_nstpu"))

if "--3d" in sys.argv:
    from navierstokes_tpu.mesh import duct_with_box_obstacle_3d
    h = float(sys.argv[-1]) if sys.argv[-1][0].isdigit() else 0.03
    mesh = duct_with_box_obstacle_3d(h=h)
    bu = 16
else:
    from navierstokes_tpu.mesh import channel_with_cylinder_2d
    h = float(sys.argv[-1]) if sys.argv[-1][0].isdigit() else 0.0063
    mesh = channel_with_cylinder_2d(h=h, h_near=h / 3)
    bu = None

sp = TaylorHoodSpace(mesh)
print(f"n_p2={sp.n_p2} n_p1={sp.n_p1} DoF={sp.dim*sp.n_p2+sp.n_p1}",
      flush=True)
cells = assembly.cell_arrays_numpy(sp)
bsr = build_bsr(sp, cells, bu=bu, bp=bu, row_multiple=128)
n_ext, K0 = bsr.f_cols.shape
print(f"n_vb={bsr.n_vb} n_ext={n_ext} K0={K0} C={K0*bsr.bu} "
      f"F GB={n_ext*bsr.bu*bsr.bu*K0*4/1e9:.3f}", flush=True)

rng = np.random.default_rng(0)
xu = jnp.asarray(rng.standard_normal((sp.n_p2, sp.dim)), jnp.float32)
f_blk = (bsr.k_blk + 0.5 * bsr.m_blk).astype(jnp.float32)

# Timing method: K matvecs CHAINED inside ONE jitted program
# (normalized power iteration under lax.fori_loop), returning a SCALAR
# that is pulled to the host inside the timed region.  Over the
# tunneled TPU nothing else is trustworthy: repeated identical
# executions are served from a cache, per-call wall times mix in tunnel
# RPC latency, and block_until_ready on a remote array handle returns
# before the computation runs (measured 123 TB/s "bandwidth").  Only a
# host pull of a value that data-depends on all K matvecs forces them.
# Two chain lengths -> slope cancels the fixed RPC/dispatch overhead.
# bsr rides as a jit ARG — a closure would inline the value arrays as
# HLO constants and blow the tunneled compile-request size limit.
K_LO, K_HI = 16, 80


def chained(apply):
    @jax.jit
    def run(b, v, x, k):
        def body(_, x):
            y = apply(b, v, x)
            return y / jnp.abs(y).max()

        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    return run


def timed_pull(fn, x, k):
    t0 = time.perf_counter()
    s = float(fn(bsr, f_blk, x, k))          # host pull forces the chain
    return time.perf_counter() - t0, s


def timeit(name, apply):
    fn = chained(apply)
    x1 = jnp.asarray(rng.standard_normal(xu.shape), jnp.float32)
    timed_pull(fn, xu, K_LO)                  # compile + warm
    timed_pull(fn, xu, K_HI)
    t_lo = min(timed_pull(fn, x1, K_LO)[0] for _ in range(3))
    t_hi = min(timed_pull(fn, x1, K_HI)[0] for _ in range(3))
    dt = (t_hi - t_lo) / (K_HI - K_LO) * 1e3
    gbps = n_ext * bsr.bu * K0 * bsr.bu * 4 / (dt * 1e-3) / 1e9
    print(f"{name:28s} {dt:8.3f} ms/matvec  "
          f"({gbps:.0f} GB/s one-pass-equivalent; "
          f"t{K_LO}={t_lo*1e3:.1f}ms t{K_HI}={t_hi*1e3:.1f}ms)",
          flush=True)
    return dt


t_x = timeit("xla apply_f", apply_f)
t_p = timeit("pallas apply_f_fused", apply_f_fused)
sx = jax.jit(lambda b, v, x: apply_f(b, v, x))
sp_ = jax.jit(lambda b, v, x: apply_f_fused(b, v, x))
y0 = np.asarray(sx(bsr, f_blk, xu))
y1 = np.asarray(sp_(bsr, f_blk, xu))
err = float(np.abs(y1 - y0).max() / (np.abs(y0).max() + 1e-30))
print(f"max rel err {err:.2e}; speedup {t_x / t_p:.2f}x", flush=True)
