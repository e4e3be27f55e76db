"""Decompose the F matvec cost on chip: gather vs multiply-reduce.

The A/B (scripts/exp_pallas_ab.py) shows XLA apply_f and the fused
Pallas reduce within 3-9% of each other in BOTH 2D and 3D even though
the fused kernel reads the value array once instead of d times — so the
shared per-component column gather, not the value stream, must dominate.
This probe times each piece with the same chained+host-pull method:

  gather   : d x jnp.take((n_vb, bu), f_cols) -> (n_ext, C)
  gather1  : one jnp.take((n_vb, d*bu), f_cols) (all components per row)
  reduce   : d x (f_blk * xg).sum(-1) on pre-gathered operands
  flatg    : d x element-flat jnp.take(x_flat, flat_idx (n_ext, C))

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_gather_probe.py [--3d] [h]
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
from navierstokes_tpu.ops.bsr import _ublocks, build_bsr

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_nstpu"))

if "--bu" in sys.argv:
    bu_arg = int(sys.argv[sys.argv.index("--bu") + 1])
else:
    bu_arg = None
if "--3d" in sys.argv:
    from navierstokes_tpu.mesh import duct_with_box_obstacle_3d
    h = float(sys.argv[-1]) if sys.argv[-1][0].isdigit() else 0.03
    mesh = duct_with_box_obstacle_3d(h=h)
    bu = bu_arg or 16
else:
    from navierstokes_tpu.mesh import channel_with_cylinder_2d
    h = float(sys.argv[-1]) if sys.argv[-1][0].isdigit() else 0.0063
    mesh = channel_with_cylinder_2d(h=h, h_near=h / 3)
    bu = bu_arg

sp = TaylorHoodSpace(mesh)
cells = assembly.cell_arrays_numpy(sp)
bsr = build_bsr(sp, cells, bu=bu, bp=bu, row_multiple=128,
                static_device=False,
                f_kmax=0 if "--kmax0" in sys.argv else -1)
if "--quick" in sys.argv:
    # matvec probing needs only the F graph — free the G/B/PP/assembly
    # device arrays (at wide bu they are GBs and OOM the chip)
    for fld in ("con_row", "con_cpos", "con_seg", "g_blk", "b_blk",
                "pp_slot_scatter", "cell_p2", "detj", "jinv", "cell_p1",
                "g_cols", "b_cols", "pp_cols", "tp_hat", "diag_idx",
                "curv_ids", "curv_nodes", "curv_phi", "curv_dphys"):
        setattr(bsr, fld, None)

n_ext, K0 = bsr.f_cols.shape
bu = bsr.bu
C = K0 * bu
d = sp.dim
print(f"DoF={sp.dim*sp.n_p2+sp.n_p1} n_ext={n_ext} K0={K0} C={C} d={d} "
      f"F GB={n_ext*bu*C*4/1e9:.3f} xg GB={d*n_ext*C*4/1e9:.3f}",
      flush=True)

rng = np.random.default_rng(0)
xu = jnp.asarray(rng.standard_normal((sp.n_p2, sp.dim)), jnp.float32)
f_blk = jnp.asarray(bsr.host_k_blk + 0.5 * bsr.host_m_blk, jnp.float32)
xb = _ublocks(bsr, xu)                                   # (n_vb, bu, d)
xb_c = jnp.moveaxis(xb, -1, 0) + 0.0                     # (d, n_vb, bu)
xb_all = xb.reshape(xb.shape[0], bu * d)                 # (n_vb, bu*d)
x_flat = [xb_c[dd].reshape(-1) for dd in range(d)]
flat_idx = (bsr.f_cols[:, :, None] * bu
            + jnp.arange(bu, dtype=jnp.int32)).reshape(n_ext, C)
xg0 = (tuple(jnp.take(xb_c[dd], bsr.f_cols, axis=0,
                      mode="clip").reshape(n_ext, C) for dd in range(d))
       if "--quick" not in sys.argv else None)

K_LO, K_HI = 16, 80


def timeit(name, make_body, x0, nbytes, consts=()):
    """make_body(x, *consts) -> (scalar, x_next); chains K times inside
    jit.  Large operands ride as jit ARGS via ``consts`` — closures
    would inline them as HLO constants and blow the tunneled
    compile-request size limit (HTTP 413)."""
    @jax.jit
    def run(x, k, *cs):
        def body(_, carry):
            x, acc = carry
            s, xn = make_body(x, *cs)
            return xn, acc + s

        _, acc = jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))
        return acc

    def pull(k):
        t0 = time.perf_counter()
        float(run(x0, k, *consts))
        return time.perf_counter() - t0

    pull(K_LO); pull(K_HI)                               # compile + warm
    t_lo = min(pull(K_LO) for _ in range(3))
    t_hi = min(pull(K_HI) for _ in range(3))
    dt = (t_hi - t_lo) / (K_HI - K_LO) * 1e3
    gbps = nbytes / (dt * 1e-3) / 1e9
    print(f"{name:24s} {dt:8.3f} ms  ({gbps:5.0f} GB/s; "
          f"t{K_LO}={t_lo*1e3:.1f} t{K_HI}={t_hi*1e3:.1f})", flush=True)
    return dt


QUICK = "--quick" in sys.argv   # only gather1 + the full formulations


# 1. per-component gathers (the production formulation)
def body_gather(x, cols):
    s = jnp.float32(0)
    for dd in range(d):
        xg = jnp.take(x[dd], cols, axis=0, mode="clip")
        s = s + xg.sum()
    return s, x * (1.0 + 0.0 * s)


if not QUICK:
    timeit("gather (d takes)", body_gather, xb_c,
           d * (n_ext * C * 4 + n_ext * K0 * 4), consts=(bsr.f_cols,))

# 2. one combined-component gather
def body_gather1(x, cols):
    xg = jnp.take(x, cols, axis=0, mode="clip")          # (n_ext,K0,bu*d)
    s = xg.sum()
    return s, x * (1.0 + 0.0 * s)


timeit("gather1 (bu*d rows)", body_gather1, xb_all,
       n_ext * C * d * 4 + n_ext * K0 * 4, consts=(bsr.f_cols,))

# 3. multiply-reduce only, pre-gathered operands (XLA)
def body_reduce(xg, fv):
    s = jnp.float32(0)
    for dd in range(d):
        y = (fv * xg[dd][:, None, :]).sum(-1)
        s = s + y.sum()
    xg2 = tuple(g * (1.0 + 0.0 * s) for g in xg)
    return s, xg2


if not QUICK:
    timeit("reduce (d passes)", body_reduce, xg0,
           d * (n_ext * bu * C * 4 + n_ext * C * 4), consts=(f_blk,))

# 4. element-flat gather
def body_flatg(x, fi):
    s = jnp.float32(0)
    for dd in range(d):
        xg = jnp.take(x[dd], fi, mode="clip")
        s = s + xg.sum()
    return s, tuple(xx * (1.0 + 0.0 * s) for xx in x)


if not QUICK:
    timeit("flat-idx gather", body_flatg, tuple(x_flat),
           d * (n_ext * C * 8 + n_ext * C * 4), consts=(flat_idx,))

# 5. full matvec, combined-gather formulation: one take of (d*bu)-float
# rows laid out component-blocked (n_vb, d, bu), per-component slices
# feeding the (XLA-fused) multiply-reduce.
xb_db = jnp.swapaxes(xb, 1, 2).reshape(xb.shape[0], d * bu)


def body_full2(x, cols, fv):
    xg = jnp.take(x, cols, axis=0, mode="clip")          # (n_ext,K0,d*bu)
    xg = xg.reshape(n_ext, K0, d, bu)
    s = jnp.float32(0)
    for dd in range(d):
        xgd = xg[:, :, dd, :].reshape(n_ext, C)
        y = (fv * xgd[:, None, :]).sum(-1)
        s = s + y.sum()
    return s, x * (1.0 + 0.0 * s)


timeit("full combined-gather", body_full2, xb_db,
       n_ext * bu * C * 4 + n_ext * C * d * 4, consts=(bsr.f_cols, f_blk))


# 6. current production apply_f for comparison (d takes + reduce)
def body_full1(x, cols, fv):
    s = jnp.float32(0)
    for dd in range(d):
        xg = jnp.take(x[dd], cols, axis=0,
                      mode="clip").reshape(n_ext, C)
        y = (fv * xg[:, None, :]).sum(-1)
        s = s + y.sum()
    return s, x * (1.0 + 0.0 * s)


timeit("full current apply_f", body_full1, xb_c,
       n_ext * bu * C * 4 + n_ext * C * d * 4, consts=(bsr.f_cols, f_blk))


# 7. combined gather + batched dot_general (MXU, N=d).  Key layout trick:
# with x rows stored (j, dd)-inner — i.e. plain xb.reshape(n_vb, bu*d),
# NO transpose — the gathered rows reshape directly to (n_ext, C, d),
# exactly the rhs a (bu, C) x (C, d) batched matmul wants, so f_blk
# streams from HBM exactly once.
def body_dotg(x, cols, fv):
    xg = jnp.take(x, cols, axis=0, mode="clip").reshape(n_ext, C, d)
    y = jax.lax.dot_general(fv, xg, (((2,), (1,)), ((0,), (0,))))
    s = y.sum()
    return s, x * (1.0 + 0.0 * s)


if not QUICK:
    timeit("full gather+dot_general", body_dotg, xb_all,
           n_ext * bu * C * 4 + n_ext * C * d * 4, consts=(bsr.f_cols, f_blk))


# 8. same math forced onto the VPU: broadcast multiply + reduce over C
def body_bcast(x, cols, fv):
    xg = jnp.take(x, cols, axis=0, mode="clip").reshape(n_ext, 1, C, d)
    y = (fv[:, :, :, None] * xg).sum(2)                  # (n_ext, bu, d)
    s = y.sum()
    return s, x * (1.0 + 0.0 * s)


if not QUICK:
    timeit("full gather+bcast-VPU", body_bcast, xb_all,
           n_ext * bu * C * 4 + n_ext * C * d * 4, consts=(bsr.f_cols, f_blk))


# 9. combined gather -> ONE transpose materializing the d contiguous
# per-component (n_ext, C) arrays (optimization_barrier stops XLA from
# re-slicing the gather d times) -> the known-to-fuse d-pass reduce.
def body_split(x, cols, fv):
    xg = jnp.take(x, cols, axis=0, mode="clip")          # (n_ext,K0,d*bu)
    xgt = xg.reshape(n_ext, K0, d, bu).transpose(2, 0, 1, 3)
    xgs = jax.lax.optimization_barrier(
        tuple(xgt[dd].reshape(n_ext, C) for dd in range(d)))
    s = jnp.float32(0)
    for dd in range(d):
        y = (fv * xgs[dd][:, None, :]).sum(-1)
        s = s + y.sum()
    return s, x * (1.0 + 0.0 * s)


timeit("full gather+T+reduce", body_split, xb_db,
       n_ext * bu * C * 4 + n_ext * C * d * 4, consts=(bsr.f_cols, f_blk))


# 10. same but WITHOUT the barrier — let XLA choose
def body_split_nb(x, cols, fv):
    xg = jnp.take(x, cols, axis=0, mode="clip")
    xgt = xg.reshape(n_ext, K0, d, bu).transpose(2, 0, 1, 3)
    s = jnp.float32(0)
    for dd in range(d):
        y = (fv * xgt[dd].reshape(n_ext, C)[:, None, :]).sum(-1)
        s = s + y.sum()
    return s, x * (1.0 + 0.0 * s)


if not QUICK:
    timeit("full gather+T (no bar)", body_split_nb, xb_db,
           n_ext * bu * C * 4 + n_ext * C * d * 4, consts=(bsr.f_cols, f_blk))


# 11. combined gather + transpose + Pallas fused reduce (one f pass)
if "--3d" not in sys.argv or True:
    from navierstokes_tpu.ops.pallas_matvec import fused_reduce
    n_pal = (n_ext // 64) * 64
    if n_pal == n_ext:
        def body_pallas(x, cols, fv):
            xg = jnp.take(x, cols, axis=0, mode="clip")
            xgt = xg.reshape(n_ext, K0, d, bu).transpose(2, 0, 1, 3)
            xgs = jax.lax.optimization_barrier(
                tuple(xgt[dd].reshape(n_ext, C) for dd in range(d)))
            y = fused_reduce(fv, xgs)
            s = y.sum()
            return s, x * (1.0 + 0.0 * s)

        timeit("full gather+T+pallas", body_pallas, xb_db,
               n_ext * bu * C * 4 + n_ext * C * d * 4,
               consts=(bsr.f_cols, f_blk))
    else:
        print(f"pallas variant skipped: n_ext={n_ext} not 64-multiple")
