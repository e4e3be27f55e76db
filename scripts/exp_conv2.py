"""Convection-assembly breakdown at bench scale: which stage costs what.

Stages timed separately (scan-chained where feasible):
  S1: convection_matrices only (element einsum)
  S2: + gather of per-(cell,a) rows
  S3: + one-hot placement to (ncon, C) rows
  S4: full (+ presorted segment_sum)
  S5: segment-sum replaced by fixed-M reshape reduce (M from histogram,
      overflow folded) — dense-reduce alternative
Also prints the contributions-per-flat-row histogram.
"""
import sys, os, time
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_nstpu"))

from navierstokes_tpu.fem.spaces import TaylorHoodSpace
from navierstokes_tpu.mesh.geometry import Mesh
from navierstokes_tpu.ops import bsr as B
from navierstokes_tpu.ops.assembly import cell_arrays_numpy
from navierstokes_tpu.ops.operators import convection_matrices

z = np.load(os.path.join(os.path.dirname(__file__), "..", ".bench_mesh.npz"))
mesh = Mesh(2, z["points"], z["cells"], z["bfaces"], z["btags"])
mesh.reorder_spatial()
space = TaylorHoodSpace(mesh, 2, 1)
cells = cell_arrays_numpy(space)
bsr = B.build_bsr(space, cells, dtype=jnp.float32, row_multiple=128,
                  static_device=False, f_kmax=-1)
n_ext, K0 = bsr.f_cols.shape
bu = bsr.bu
Cw = K0 * bu
seg = np.asarray(bsr.con_seg, np.int64)
ncon = len(seg)
nseg = n_ext * bu
mult = np.bincount(seg, minlength=nseg)
h = np.bincount(mult)
print(f"ncon={ncon} nseg={nseg} mult: mean={mult.mean():.2f} "
      f"max={mult.max()} hist={dict((i, int(c)) for i, c in enumerate(h) if c)}",
      flush=True)

rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((bsr.n_p2, 2)), jnp.float32)


def chain(name, step, x0, N=16):
    def prog(x_):
        def body(xc, _):
            y = step(xc)
            return y * 1e-6 + x_ * 0.5, None
        xc, _ = jax.lax.scan(body, x_, None, length=N)
        return xc
    prog = jax.jit(prog)
    out = jax.block_until_ready(prog(x0))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(prog(x0))
        best = min(best, (time.perf_counter() - t0) / N)
    print(f"{name:52s} {best*1e3:8.3f} ms", flush=True)


def to_u(v):
    # reduce any intermediate to a (n_p2, 2) carry perturbation
    s = v.reshape(-1)[: bsr.n_p2 * 2].reshape(bsr.n_p2, 2)
    return s


# S1
chain("S1 convection_matrices", lambda x: to_u(
    convection_matrices(bsr, bsr.t_hat, x)), u)

# S2: + gather
def s2(x):
    c = convection_matrices(bsr, bsr.t_hat, x)
    ce = jnp.take(c.reshape(-1, c.shape[1] * c.shape[2]), bsr.con_cell,
                  axis=0, mode="clip")
    return to_u(ce.sum(1, keepdims=True) * jnp.ones((1, 2), c.dtype))
chain("S2 + gather (ncon, 36) rows", s2, u)

# S3: + placement
def s3(x):
    c = convection_matrices(bsr, bsr.t_hat, x)
    ce = jnp.take(c.reshape(-1, c.shape[1] * c.shape[2]), bsr.con_cell,
                  axis=0, mode="clip")
    io = jnp.arange(Cw, dtype=jnp.int32)
    W = (bsr.con_cpos[:, :, None].astype(jnp.int32) == io)
    rows = (ce[:, :, None] * W.astype(c.dtype)).sum(1)
    return to_u(rows.sum(1, keepdims=True) * jnp.ones((1, 2), c.dtype))
chain("S3 + one-hot placement", s3, u)

# S4: full
chain("S4 full convection_blk", lambda x: to_u(
    B.convection_blk(bsr, x)), u)
