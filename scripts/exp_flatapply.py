"""A/B apply_f + convection variants at bench scale on the real graph.

Variants measured (flat row-major F layout, C=128):
  apply_f A: one gather + minor transpose + full-lane reduce (current)
  apply_f C: per-component gather (2 gathers, no transpose)
  apply_f E: one gather + per-component strided slice
  apply_f H: batched dot_general on the MXU (N=dim padded)
  conv   V0: 36-wide one-hot placement (current)
  conv   V1: 6-wide one-hot from (nc*nv, nv) source
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

z = np.load(os.path.join(os.path.dirname(__file__), "..", ".bench_mesh.npz"))
mesh = Mesh(2, z["points"], z["cells"], z["bfaces"], z["btags"])
mesh.reorder_spatial()
space = TaylorHoodSpace(mesh, 2, 1)
cells = cell_arrays_numpy(space)
t0 = time.time()
bsr = B.build_bsr(space, cells, dtype=jnp.float32, row_multiple=128,
                  static_device=False, f_kmax=-1)
print(f"build {time.time()-t0:.0f}s; f_cols {bsr.f_cols.shape}", flush=True)

rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((bsr.n_p2, 2)), jnp.float32)
f_blk = jnp.asarray(rng.standard_normal(
    (bsr.f_cols.shape[0], bsr.bu, bsr.f_cols.shape[1] * bsr.bu)),
    jnp.float32)


def timeit(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:52s} {best*1e3:8.3f} ms", flush=True)
    return out


def timeit_chain(name, step, e, fb, x0, N=32):
    """Scan-chained matvec timing: y feeds the next input, so the device
    must execute all N sequentially (async-dispatch-proof)."""
    def prog(fb_, x_):
        def body(xc, _):
            y = step(e, fb_, xc)
            return y * 1e-6 + x_ * 0.5, None
        xc, _ = jax.lax.scan(body, x_, None, length=N)
        return xc
    prog = jax.jit(prog)
    out = jax.block_until_ready(prog(fb, x0))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(prog(fb, x0))
        best = min(best, (time.perf_counter() - t0) / N)
    print(f"{name:52s} {best*1e3:8.3f} ms", flush=True)
    return out


def apply_f_C(e, fb, xu):
    n_ext, bu, C = fb.shape
    xb = B._ublocks(e, xu)
    ys = []
    for d in range(xu.shape[1]):
        xbd = xb[..., d]                                  # (n_vb, bu)
        xg = jnp.take(xbd, e.f_cols, axis=0, mode="clip").reshape(n_ext, C)
        ys.append((fb * xg[:, None, :]).sum(-1))          # (n_ext, bu)
    y = jnp.stack(ys, axis=-1)
    y = B._fold_overflow(e, y)
    return y.reshape(-1, xu.shape[1])[:e.n_p2]


def apply_f_E(e, fb, xu):
    n_ext, bu, C = fb.shape
    xb = B._ublocks(e, xu)
    xg = jnp.take(xb, e.f_cols, axis=0, mode="clip").reshape(n_ext, C, -1)
    ys = [(fb * xg[..., d][:, None, :]).sum(-1) for d in range(xu.shape[1])]
    y = jnp.stack(ys, axis=-1)
    y = B._fold_overflow(e, y)
    return y.reshape(-1, xu.shape[1])[:e.n_p2]


def apply_f_H(e, fb, xu):
    n_ext, bu, C = fb.shape
    xb = B._ublocks(e, xu)
    xg = jnp.take(xb, e.f_cols, axis=0, mode="clip").reshape(n_ext, C, -1)
    y = jax.lax.dot_general(fb, xg, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    y = B._fold_overflow(e, y)
    return y.reshape(-1, xu.shape[1])[:e.n_p2]


jf_A = jax.jit(lambda e, fb, x: B.apply_f(e, fb, x))
jf_C = jax.jit(apply_f_C)
jf_E = jax.jit(apply_f_E)
jf_H = jax.jit(apply_f_H)

ya = jf_A(bsr, f_blk, u)
yc = jf_C(bsr, f_blk, u)
ye = jf_E(bsr, f_blk, u)
yh = jf_H(bsr, f_blk, u)
print("err C/E/H:",
      float(jnp.abs(ya - yc).max()), float(jnp.abs(ya - ye).max()),
      float(jnp.abs(ya - yh).max()), flush=True)
timeit_chain("apply_f A (transpose+reduce)", B.apply_f, bsr, f_blk, u)
timeit_chain("apply_f C (per-d gather)", apply_f_C, bsr, f_blk, u)
timeit_chain("apply_f E (per-d slice)", apply_f_E, bsr, f_blk, u)
timeit_chain("apply_f H (MXU dot_general)", apply_f_H, bsr, f_blk, u)
f16 = f_blk.astype(jnp.bfloat16)
timeit_chain("apply_f A bf16", B.apply_f, bsr, f16, u)
timeit_chain("apply_f C bf16", apply_f_C, bsr, f16, u)
timeit_chain("apply_f H bf16", apply_f_H, bsr, f16, u)

# ---- convection variants -------------------------------------------------
jc_V0 = jax.jit(lambda e, uu: B.convection_blk(e, uu))
v0 = timeit("conv V0 (36-wide one-hot)", jc_V0, bsr, u, n=10)

# V1: 6-wide one-hot from (nc*nv, nv) source; needs con row index cell*nv+a
# — rebuild host side here for the experiment
cp2 = np.asarray(space.cell_p2, np.int64)
nc, nv = cp2.shape
bu = bsr.bu
K0 = bsr.f_cols.shape[1]
Cw = K0 * bu
# recover (cell, a, v) and per-b cpos from the committed con_cpos
cpos_h = np.asarray(bsr.con_cpos, np.int64)      # (ncon, 36)
con_cell_h = np.asarray(bsr.con_cell, np.int64)
# a of each contribution = the row of the 6x6 grid with any live entry
live = (cpos_h >= 0).reshape(-1, nv, nv)
a_of = np.argmax(live.any(axis=2), axis=1)
row_idx = con_cell_h * nv + a_of
cpos6 = cpos_h.reshape(-1, nv, nv)[np.arange(len(a_of)), a_of]   # (ncon, 6)
row_idx_j = jnp.asarray(row_idx.astype(np.int32))
cpos6_j = jnp.asarray(cpos6.astype(np.int8))


def conv_V1(e, uu):
    from navierstokes_tpu.ops.operators import convection_matrices
    c_elem = convection_matrices(e, e.t_hat, uu)
    c6 = c_elem.reshape(-1, nv)                         # (nc*nv, nv)
    ce = jnp.take(c6, row_idx_j, axis=0, mode="clip")   # (ncon, 6)
    io = jnp.arange(Cw, dtype=jnp.int32)
    W = (cpos6_j[:, :, None].astype(jnp.int32) == io)
    rows = (ce[:, :, None] * W.astype(c_elem.dtype)).sum(1)
    vals = jax.ops.segment_sum(rows, e.con_seg,
                               num_segments=e.f_cols.shape[0] * bu,
                               indices_are_sorted=True)
    return vals.reshape(e.f_cols.shape[0], bu, Cw)


jc_V1 = jax.jit(conv_V1)
v1 = timeit("conv V1 (6-wide one-hot)", jc_V1, bsr, u, n=10)
print("conv err:", float(jnp.abs(v0 - v1).max()), flush=True)
