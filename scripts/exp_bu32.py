"""bu=32 block-size experiment: fewer, wider gather rows for apply_f.

At bu=16/K0=8 the F matvec is gather-row-bound (~5.7 ns/row, 786k rows
per matvec in the per-component variant).  bu=32 quarters the row count
at ~1.5x the ELL padding.  Measures apply_f + convection + storage."""
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

BU = int(os.environ.get("BU", "32"))

z = np.load(os.path.join(os.path.dirname(__file__), "..", ".bench_mesh.npz"))
mesh = Mesh(2, z["points"], z["cells"], z["bfaces"], z["btags"])
mesh.reorder_spatial()
space = TaylorHoodSpace(mesh, 2, 1)
cells = cell_arrays_numpy(space)
t0 = time.time()
bsr = B.build_bsr(space, cells, dtype=jnp.float32, bu=BU, bp=16,
                  row_multiple=128, static_device=False, f_kmax=-1)
n_ext, K0 = bsr.f_cols.shape
print(f"build {time.time()-t0:.0f}s; bu={BU} f_cols {bsr.f_cols.shape} "
      f"C={K0*BU} storage={n_ext*K0*BU*BU*4/1e6:.0f} MB "
      f"gather_rows={n_ext*K0} ncon={bsr.con_cell.shape[0]}", flush=True)

rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((bsr.n_p2, 2)), jnp.float32)
f_blk = jnp.asarray(rng.standard_normal((n_ext, BU, K0 * BU)), jnp.float32)


def chain(name, step, fb, x0, N=24):
    def prog(fb_, x_):
        def body(xc, _):
            y = step(fb_, xc)
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


def apply_f_C(fb, xu):
    ne, bu, C = fb.shape
    xb = B._ublocks(bsr, xu)
    ys = []
    for d in range(xu.shape[1]):
        xg = jnp.take(xb[..., d], bsr.f_cols, axis=0,
                      mode="clip").reshape(ne, C)
        ys.append((fb * xg[:, None, :]).sum(-1))
    y = jnp.stack(ys, axis=-1)
    y = B._fold_overflow(bsr, y)
    return y.reshape(-1, xu.shape[1])[:bsr.n_p2]


chain("apply_f A fp32", lambda fb, x: B.apply_f(bsr, fb, x), f_blk, u)
chain("apply_f C fp32", apply_f_C, f_blk, u)
f16 = f_blk.astype(jnp.bfloat16)
chain("apply_f C bf16", apply_f_C, f16, u)


def chain_u(name, step, x0, N=10):
    def prog(x_):
        def body(xc, _):
            y = step(xc)
            s = y.reshape(-1)[: bsr.n_p2 * 2].reshape(bsr.n_p2, 2)
            return s * 1e-6 + x_ * 0.5, None
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


chain_u("convection_blk", lambda x: B.convection_blk(bsr, x), u)

# parity vs bu=16 build through the dense row route
bsr16 = B.build_bsr(space, cells, dtype=jnp.float32, bu=16, bp=16,
                    row_multiple=128, static_device=False, f_kmax=-1)
c32 = jax.jit(lambda x: B.convection_blk(bsr, x))(u)
c16 = jax.jit(lambda x: B.convection_blk(bsr16, x))(u)
y32 = jax.jit(lambda c, x: B.apply_f(bsr, c, x))(c32, u)
y16 = jax.jit(lambda c, x: B.apply_f(bsr16, c, x))(c16, u)
print("conv-apply parity bu32 vs bu16:",
      float(jnp.abs(y32 - y16).max()), flush=True)
