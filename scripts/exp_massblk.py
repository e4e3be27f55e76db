"""Isolate the blocked-mass NaN at bench scale: compare node-ELL vs
blocked mass applies on-chip, and f64-device-convert vs host-f32 uploads."""
import numpy as np
import jax
import jax.numpy as jnp

from navierstokes_tpu.fem.spaces import TaylorHoodSpace
from navierstokes_tpu.mesh.geometry import Mesh
from navierstokes_tpu.ops.assembly import cell_arrays_numpy
from navierstokes_tpu.ops import bsr as B
from navierstokes_tpu.ops.p1ell import build_mass_node_ell, node_mass_apply

zm = np.load("/root/repo/.bench_mesh.npz")
mesh = Mesh(2, zm["points"], zm["cells"], zm["bfaces"], zm["btags"])
mesh.reorder_spatial()
sp = TaylorHoodSpace(mesh, 2, 1)
host = cell_arrays_numpy(sp)
print("building bsr ...", flush=True)
bsr = B.build_bsr(sp, host, dtype=jnp.float32, row_multiple=128,
                  static_device=False)
print("n_vb", bsr.n_vb, "f_cols", bsr.f_cols.shape, flush=True)
nell = build_mass_node_ell(sp, host, jnp.float32)

rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((sp.n_p2, 2)).astype(np.float32))

y_node = jax.jit(node_mass_apply)(nell, u)
print("node mass: finite =", bool(jnp.isfinite(y_node).all()),
      " norm =", float(jnp.linalg.norm(y_node)), flush=True)

# host-f32 upload
m32 = jnp.asarray(np.asarray(bsr.host_m_blk, np.float32))
y_blk32 = jax.jit(lambda m, u: B.apply_f(bsr, m, u))(m32, u)
print("blk f32-host: finite =", bool(jnp.isfinite(y_blk32).all()),
      " max|diff| =", float(jnp.abs(y_blk32 - y_node).max()), flush=True)

# f64 host -> device convert (the model's original path)
m64 = jnp.asarray(bsr.host_m_blk, jnp.float32)
y_blk64 = jax.jit(lambda m, u: B.apply_f(bsr, m, u))(m64, u)
print("blk f64-conv: finite =", bool(jnp.isfinite(y_blk64).all()),
      " max|diff| =", float(jnp.abs(y_blk64 - y_node).max()), flush=True)
