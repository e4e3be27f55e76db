"""Chip check for the Newton-Schulz block-Jacobi inversion at bench scale.

Questions:
  1. what is r = max tile row-sum of (I - F X0) with X0 = inv(tiles(A0)),
     at a developed-flow velocity magnitude (CFL~8 bench point)?
  2. if r >= 0.9 (guard falls back to LU), does Newton still converge
     in practice (spectral radius < row-sum bound)?
  3. timings: exact LU vs Newton-k at 1M DoF.

Run on the TPU: python scripts/exp_bjnewton.py
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


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e3:9.3f} ms", flush=True)
    return out


def main():
    from bench import build_mesh
    from navierstokes_tpu.config import InletConfig, SolverConfig
    from navierstokes_tpu.models.navier_stokes import NavierStokes
    from navierstokes_tpu.ops import bsr as B
    from navierstokes_tpu.ops.p1ell import (block_jacobi_tiles,
                                            block_jacobi_invert)

    mesh = build_mesh()
    inlet = InletConfig(kind="parabolic", u_m=1.5, height=0.41)
    cfg = SolverConfig(dtype="float32", output_dir="/tmp/prof_out",
                       cache_dir="/tmp/prof_cache", csv_path="/tmp/prof.csv",
                       scheme="projection", proj_bdf2=False,
                       outer_maxiter=128)
    ns = NavierStokes(mesh, 2, 1, deltat=0.02, T=1.0, step=10, inlet=inlet,
                      config=cfg)
    ns.set_re_number(100)
    ns.setup()
    ns._init_state(0)
    params = ns._params()
    bsr = params.cells
    plan = params.bj_plan
    print(f"n_p2={bsr.n_p2}, tiles: {plan.n_tiles} x {plan.S*plan.bu}^2")

    # developed-flow-magnitude velocity: parabolic profile everywhere
    pts = np.asarray(ns.space.p2_coords)
    y = pts[:, 1]
    u_np = np.zeros((bsr.n_p2, 2), np.float32)
    u_np[:, 0] = 4.0 * 1.5 * y * (0.41 - y) / 0.41**2
    u = jnp.asarray(u_np)

    conv = jax.jit(lambda e, uu: B.convection_blk(e, uu))
    f_blk = params.a0_cell + conv(bsr, u)
    jax.block_until_ready(f_blk)
    mflat = params.bc.mask[:, 0]
    d = B.f_diag(bsr, f_blk)
    sigma = jnp.sum(d * mflat) / jnp.maximum(jnp.sum(mflat), 1.0)

    tiles_j = jax.jit(lambda fb, mf, s: block_jacobi_tiles(plan, fb, mf, s))
    a = tiles_j(f_blk, mflat, sigma)
    a0t = tiles_j(params.a0_cell, mflat, sigma)

    @jax.jit
    def diagnose(a, a0t):
        x0 = jnp.linalg.inv(a0t)
        eye = jnp.eye(a.shape[-1], dtype=jnp.float32)
        ax = jnp.matmul(a, x0, preferred_element_type=jnp.float32)
        resid = jnp.abs(eye[None] - ax).sum(-1).max(-1)   # per-tile row-sum
        x = x0
        errs = []
        for k in range(6):
            x = 2.0 * x - jnp.matmul(
                jnp.matmul(x, a, preferred_element_type=jnp.float32), x,
                preferred_element_type=jnp.float32)
            errs.append(jnp.abs(eye[None] - jnp.matmul(
                a, x, preferred_element_type=jnp.float32)).sum(-1).max())
        return x0, resid, jnp.stack(errs)

    x0, resid, errs = diagnose(a, a0t)
    r_all = np.asarray(resid)
    print(f"per-tile ||I - F X0||_inf: max={r_all.max():.3f} "
          f"p99={np.percentile(r_all, 99):.3f} "
          f"median={np.median(r_all):.3f} "
          f"frac>=0.9: {(r_all >= 0.9).mean():.3f}", flush=True)
    for k, e in enumerate(np.asarray(errs)):
        print(f"  newton iter {k+1}: max row-sum err {float(e):.4f}",
              flush=True)

    # timings
    lu = jax.jit(lambda fb, mf, s: block_jacobi_invert(
        plan, fb, mf, s, x0=None, iters=0))
    timeit("exact LU inverse (round-2 per-step cost)", lu, f_blk, mflat,
           sigma, n=3)
    for it in (2, 3, 4):
        nw = jax.jit(lambda fb, mf, s, _it=it: block_jacobi_invert(
            plan, fb, mf, s, x0=x0, iters=_it))
        timeit(f"block_jacobi_invert newton-{it} (guarded)", nw, f_blk,
               mflat, sigma, n=3)

    # quality: preconditioned residual reduction equivalence
    nw3 = jax.jit(lambda fb, mf, s: block_jacobi_invert(
        plan, fb, mf, s, x0=x0, iters=3))
    xlu = lu(f_blk, mflat, sigma)
    xnw = nw3(f_blk, mflat, sigma)
    dif = jax.jit(lambda a_, b_: jnp.abs(
        a_.astype(jnp.float32) - b_.astype(jnp.float32)).max())(xlu, xnw)
    print(f"max |inv_LU - inv_newton3| = {float(dif):.2e}  "
          f"(scale {float(jnp.abs(xlu).max()):.2e})")


if __name__ == "__main__":
    main()
