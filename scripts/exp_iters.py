"""Outer-iteration sweep at the bench operating point (2D-2, Re=100,
dt=0.02).  Measures FGMRES iterations-to-tolerance and wall/step for a
matrix of preconditioner configurations — the evidence base for picking
the production solver config (VERDICT round-1 item #1).

Usage: python scripts/exp_iters.py [--h H] [--steps N] [CONFIG ...]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIGS = {
    # name: overrides on SolverConfig
    "r1-jacobi-bicg10": dict(f_precond="jacobi", f_solver="bicgstab",
                             inner_maxiter_f=10),
    "bj-rich10": dict(f_precond="bj", f_solver="richardson",
                      inner_maxiter_f=10),
    "bj-rich4": dict(f_precond="bj", f_solver="richardson",
                     inner_maxiter_f=4),
    "bj-bicg5": dict(f_precond="bj", f_solver="bicgstab",
                     inner_maxiter_f=5),
    "bj-bicg10": dict(f_precond="bj", f_solver="bicgstab",
                      inner_maxiter_f=10),
    "bj-bicg30": dict(f_precond="bj", f_solver="bicgstab",
                      inner_maxiter_f=30),
    "pcd-bj-bicg10": dict(preconditioner="pcd", f_precond="bj",
                          f_solver="bicgstab", inner_maxiter_f=10),
    "pcd-bj-rich10": dict(preconditioner="pcd", f_precond="bj",
                          f_solver="richardson", inner_maxiter_f=10),
    "pcd-bj-bicg30": dict(preconditioner="pcd", f_precond="bj",
                          f_solver="bicgstab", inner_maxiter_f=30),
    "proj": dict(scheme="projection"),
    "proj-f60": dict(scheme="projection", proj_f_maxiter=60),
    "proj-f100-p50": dict(scheme="projection", proj_f_maxiter=100,
                          proj_p_maxiter=50),
    "proj-f200-p60": dict(scheme="projection", proj_f_maxiter=200,
                          proj_p_maxiter=60),
    "proj-tol1e4": dict(scheme="projection", proj_f_maxiter=100,
                        proj_p_maxiter=50, outer_tol=1.0e-4),
    "proj-bf16": dict(scheme="projection", inner_bf16=True),
    "proj-bj16": dict(scheme="projection", proj_bdf2=False,
                      bj_tile_blocks=16),
    "proj-bdf1": dict(scheme="projection", proj_bdf2=False),
    "proj-bf16-bj16": dict(scheme="projection", inner_bf16=True,
                           bj_tile_blocks=16),
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*", default=None)
    ap.add_argument("--h", type=float, default=0.0)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--deltat", type=float, default=0.02)
    ap.add_argument("--maxiter", type=int, default=128)
    args = ap.parse_args()
    names = args.configs or list(CONFIGS)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_nstpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from navierstokes_tpu.config import InletConfig, SolverConfig
    from navierstokes_tpu.models.navier_stokes import NavierStokes

    if args.h:
        from navierstokes_tpu.mesh import channel_with_cylinder_2d
        mesh = channel_with_cylinder_2d(h=args.h, h_near=args.h / 2)
    else:
        import numpy as np
        from navierstokes_tpu.mesh.geometry import Mesh
        z = np.load(os.path.join(os.path.dirname(__file__), "..",
                                 ".bench_mesh.npz"))
        mesh = Mesh(2, z["points"], z["cells"], z["bfaces"], z["btags"])

    inlet = InletConfig(kind="parabolic", u_m=1.5, height=0.41)
    cfg = SolverConfig(dtype="float32", outer_maxiter=args.maxiter,
                       output_dir="/tmp/exp_out", cache_dir="/tmp/exp_cache",
                       csv_path="/tmp/exp_forces.csv")
    ns = NavierStokes(mesh, 2, 1, deltat=args.deltat, T=1.0, step=10,
                      inlet=inlet, config=cfg)
    ns.set_re_number(100)
    t0 = time.time()
    ns.setup()
    log(f"setup {time.time() - t0:.0f}s; DoFs {ns.space.n_dofs}")

    results = {}
    for name in names:
        over = CONFIGS[name]
        for k, v in over.items():
            setattr(ns.config, k, v)
        if "bj_tile_blocks" in over:
            ns._build_cc_statics()  # rebuild the BJ tile plan
        ns._build_static()  # scheme/dt-dependent operator coefficients
        ns._chunks = {}  # config is baked into the trace -> recompile
        ns._init_state(0)
        params = ns._params()
        run = ns._chunk_fn(1)
        u, p, up, phi, t = (ns._u, ns._p, ns._u_prev, ns._phi,
                    jnp.asarray(0.0, ns.dtype))
        t0 = time.time()
        iters, res, walls = [], [], []
        for k in range(args.steps):
            t1 = time.time()
            u, p, up, phi, t, ms = run(params, u, p, up, phi, t)
            it = int(ms.iterations[0])
            walls.append(time.time() - t1)
            iters.append(it)
            res.append(float(ms.residual[0]))
        # last-step wall is compile-free
        results[name] = dict(iters=iters,
                             res=[f"{r:.1e}" for r in res],
                             wall_last=round(walls[-1], 2),
                             cd=round(float(ms.cd[0]), 4))
        log(f"{name:22s} iters={iters} res={results[name]['res']} "
            f"wall_last={walls[-1]:.2f}s cd={results[name]['cd']}")
        # restore defaults for next config
        base = SolverConfig()
        for k in over:
            setattr(ns.config, k, getattr(base, k))

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
