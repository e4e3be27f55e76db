"""On-chip micro-profiler at bench scale: times each solver building block
(F matvec, Bt/B, V-cycle, inner F solve, CC vmult, full outer iteration,
full step) so optimization effort goes where the time is.

Run on the TPU: python scripts/profile_bench.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_nstpu"))


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    from bench import build_mesh
    from navierstokes_tpu.config import InletConfig, SolverConfig
    from navierstokes_tpu.models.navier_stokes import NavierStokes
    from navierstokes_tpu.ops import bsr as B

    mesh = build_mesh()
    inlet = InletConfig(kind="parabolic", u_m=1.5, height=0.41)
    cfg = SolverConfig(dtype="float32", output_dir="/tmp/prof_out",
                       cache_dir="/tmp/prof_cache", csv_path="/tmp/prof.csv",
                       outer_maxiter=128)
    ns = NavierStokes(mesh, 2, 1, deltat=0.02, T=1.0, step=10, inlet=inlet,
                      config=cfg)
    ns.set_re_number(100)
    ns.setup()
    ns._init_state(0)
    params = ns._params()
    bsr = params.cells
    sp = ns.space
    n_vb, KB = bsr.f_cols.shape
    _, KG = bsr.g_cols.shape
    _, KBb = bsr.b_cols.shape
    print(f"n_p2={bsr.n_p2} n_p1={bsr.n_p1} bu={bsr.bu} bp={bsr.bp}")
    print(f"F blocks: n_vb={n_vb} KB={KB} -> "
          f"{n_vb*KB*bsr.bu*bsr.bu*4/1e6:.0f} MB fp32")
    print(f"G: KG={KG} ({n_vb*KG*2*bsr.bu*bsr.bp*4/1e6:.0f} MB); "
          f"B: KBb={KBb} ({bsr.b_cols.shape[0]*KBb*2*bsr.bp*bsr.bu*4/1e6:.0f} MB)")
    # true nnz estimate
    cp2 = np.asarray(sp.cell_p2)
    import scipy.sparse as ssp  # noqa
    print(f"cells={cp2.shape[0]}, est true F nnz ~ "
          f"{cp2.shape[0]*36*2/2.4e6:.1f}M scalar entries")

    mask = params.bc.mask
    u = jnp.asarray(np.random.default_rng(0).standard_normal(
        (bsr.n_p2, 2)), jnp.float32)
    p = jnp.asarray(np.random.default_rng(1).standard_normal(
        bsr.n_p1), jnp.float32)

    # pass bsr as a jit ARGUMENT: closing over it embeds the 300-500 MB
    # static blocks as constants in the compile request, which overflows
    # the tunneled remote-compile body limit (HTTP 413)
    conv = jax.jit(lambda e, uu: B.convection_blk(e, uu))
    f_blk = conv(bsr, u)
    f_blk = params.a0_cell + f_blk
    jax.block_until_ready(f_blk)

    apply_f = jax.jit(lambda e, fb, x: B.apply_f(e, fb, x))
    apply_bt = jax.jit(lambda e, xp: B.apply_bt(e, xp))
    apply_b = jax.jit(lambda e, xu: B.apply_b(e, xu))

    timeit("convection_blk (per-step assembly)", conv, bsr, u)
    t_f = timeit("apply_f (F matvec)", apply_f, bsr, f_blk, u)
    f16 = f_blk.astype(jnp.bfloat16)
    timeit("apply_f bf16 values", apply_f, bsr, f16, u)
    timeit("apply_bt (G matvec)", apply_bt, bsr, p)
    timeit("apply_b (B matvec)", apply_b, bsr, u)

    # V-cycle on Ap
    from navierstokes_tpu.solvers.schur import make_vcycle_solver
    wap = params.ap_w

    def apply_ap(v):
        return B.apply_b(bsr, B.apply_bt(bsr, v) * (wap * mask[:, 0])[:, None])

    from navierstokes_tpu.ops.p1ell import ell_matvec
    ap_op = params.ap_dir if params.ap_dir is not None else params.ap
    apply_ell = jax.jit(lambda op, v: ell_matvec(op, v))
    timeit("ell_matvec Ap (P1 Poisson)", apply_ell, ap_op, p)
    solve_ap = jax.jit(make_vcycle_solver(
        lambda v: ell_matvec(ap_op, v), ap_op.diag, ns._coarse_plan,
        params.ap_dir_sc_inv if params.ap_dir is not None
        else params.ap_sc_inv,
        n_cycles=1, smooth_k=cfg.schur_smooth_k,
        lam_max=(params.ap_dir_lam if params.ap_dir is not None
                 else params.ap_lam)))
    timeit("V-cycle precond (Poisson)", solve_ap, p)

    # block-Jacobi tile build (per step)
    from navierstokes_tpu.ops.p1ell import (block_jacobi_apply,
                                            block_jacobi_inverse)
    if params.bj_plan is not None:
        mflat0 = mask[:, 0]
        bj_inv = jax.jit(lambda fb, mf: block_jacobi_inverse(
            params.bj_plan, fb, mf, 1.0))
        tiles = timeit("block_jacobi_inverse (per step)", bj_inv,
                       f_blk, mflat0, n=5)
        tiles_v = bj_inv(f_blk, mflat0)
        bj_app = jax.jit(lambda tv, r: block_jacobi_apply(
            params.bj_plan, tv, r))
        timeit("block_jacobi_apply", bj_app, tiles_v, u)
    mass_j = jax.jit(lambda e, uu: ns._ops.mass_apply(
        type("P", (), {"cells": e, "mass_ell": params.mass_ell})(), uu))
    try:
        timeit("mass_apply (per step)", mass_j, bsr, u)
    except Exception as ex:
        print(f"mass_apply skipped: {ex}")

    # inner F solve as configured
    from navierstokes_tpu.solvers.preconditioners import InnerSolve
    d = B.f_diag(bsr, f_blk)
    mflat = mask[:, 0]
    sigma = jnp.sum(d * mflat) / jnp.maximum(jnp.sum(mflat), 1.0)
    d_bc = d * mflat + sigma * (1.0 - mflat)
    dinv = (1.0 / d_bc)[:, None]
    inner_f = InnerSolve(cfg.inner_tol, cfg.inner_maxiter_f)

    def inner_run(e, fb, rhs):
        def masked_f(x):
            xm = x * mask
            y = B.apply_f(e, fb, xm)
            return y * mask + sigma * (x - xm)
        return inner_f(masked_f, rhs, lambda r: r * dinv)

    inner = jax.jit(inner_run)
    t_in = timeit(f"inner F solve (bicgstab {cfg.inner_maxiter_f})",
                  inner, bsr, f_blk, u, n=5)
    print(f"  -> per matvec-equivalent: "
          f"{t_in/(2*cfg.inner_maxiter_f)*1e3:.3f} ms "
          f"(bare matvec {t_f*1e3:.3f} ms)")

    # one full outer iteration ~ apply_A + vmult
    # full step
    run = ns._chunk_fn(1)
    uu, pp, up, ph = ns._u, ns._p, ns._u_prev, ns._phi
    t0 = time.perf_counter()
    out = run(params, uu, pp, up, ph, jnp.asarray(0.0, jnp.float32))
    jax.block_until_ready(out)
    print(f"step 1 (compile+run): {time.perf_counter()-t0:.1f} s")
    uu, pp, up, ph, t, ms = out
    t0 = time.perf_counter()
    out = run(params, uu, pp, up, ph, t)
    jax.block_until_ready(out)
    wall = time.perf_counter() - t0
    uu, pp, up, ph, t, ms = out
    its = int(ms.iterations[0])
    print(f"step 2: {wall:.2f} s, {its} outer its -> "
          f"{wall/its*1e3:.1f} ms/outer-iteration")


if __name__ == "__main__":
    main()
