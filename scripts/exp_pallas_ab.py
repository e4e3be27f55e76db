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

# bsr rides as a jit ARG — a closure would inline the value arrays as
# HLO constants and blow the tunneled compile-request size limit
fx = jax.jit(lambda b, v, x: apply_f(b, v, x))
fp = jax.jit(lambda b, v, x: apply_f_fused(b, v, x))


def timeit(name, fn, n=50):
    y = jax.block_until_ready(fn(bsr, f_blk, xu))
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(bsr, f_blk, xu)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:28s} {dt:8.3f} ms", flush=True)
    return y, dt


y0, t_x = timeit("xla apply_f", fx)
y1, t_p = timeit("pallas apply_f_fused", fp)
err = float(jnp.abs(y1 - y0).max() / (jnp.abs(y0).max() + 1e-30))
print(f"max rel err {err:.2e}; speedup {t_x / t_p:.2f}x", flush=True)
