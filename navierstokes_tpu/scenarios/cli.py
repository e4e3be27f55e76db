"""Command-line driver.

Replaces the reference's per-scenario compiled mains + shell scripts
(src/main.cpp, tests/*/run via cmake builds, tests/2D/test_naca/run_test.sh)
with one CLI:

    python -m navierstokes_tpu run 2d-test1 [--h 0.02] [--T 2.0] ...
    python -m navierstokes_tpu postprocess --t0 0 --t1 20 --step 2 ...
    python -m navierstokes_tpu sweep-naca --angles 0 2 4 8
    python -m navierstokes_tpu list
"""

from __future__ import annotations

import argparse
import os

from navierstokes_tpu.config import SolverConfig
from navierstokes_tpu.scenarios.registry import (SCENARIOS, build_solver,
                                                 get_scenario)


def _enable_cache():
    import jax
    # honor JAX_PLATFORMS even when a sitecustomize force-registers an
    # accelerator backend (this environment's axon TPU tunnel overrides
    # the env var; only the explicit config update reliably wins)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_nstpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _add_common(p):
    p.add_argument("--h", type=float, default=None, help="mesh size")
    p.add_argument("--deltat", type=float, default=None)
    p.add_argument("--T", type=float, default=None)
    p.add_argument("--output-step", type=int, default=None)
    p.add_argument("--re", type=float, default=None)
    p.add_argument("--mesh", type=str, default=None,
                   help="gmsh .msh path (overrides the native generator)")
    p.add_argument("--dtype", type=str, default="float32")
    # default/choices follow SolverConfig so the CLI reaches the same
    # performance path as the library (round-1 gap: 'cc'/'pcd' missing)
    p.add_argument("--preconditioner", type=str,
                   default=SolverConfig.preconditioner,
                   choices=["identity", "asimple", "ayosida", "cc", "pcd"])
    p.add_argument("--operator", type=str, default=SolverConfig.operator,
                   choices=["bsr", "ell", "cells"])
    p.add_argument("--scheme", type=str, default=SolverConfig.scheme,
                   choices=["monolithic", "projection"],
                   help="monolithic = reference-parity coupled solve; "
                        "projection = pressure-correction (fast)")
    p.add_argument("--n-devices", type=int, default=SolverConfig.n_devices,
                   help="0 = all visible devices, 1 = single device")
    p.add_argument("--refine", type=int, default=SolverConfig.refine,
                   help="compensated iterative-refinement passes per "
                        "monolithic solve (f64-grade accuracy on fp32 "
                        "hardware; solvers/refine.py)")
    p.add_argument("--output-dir", type=str, default="output")
    p.add_argument("--cache-dir", type=str, default="cache")
    p.add_argument("--csv", type=str, default="forces_vs_time.csv")


def _build(args, name, mesh_kwargs=None):
    cfg = SolverConfig(dtype=args.dtype, preconditioner=args.preconditioner,
                       operator=args.operator, n_devices=args.n_devices,
                       scheme=args.scheme, refine=args.refine,
                       output_dir=args.output_dir, cache_dir=args.cache_dir,
                       csv_path=args.csv)
    overrides = {}
    if args.deltat is not None:
        overrides["deltat"] = args.deltat
    if args.T is not None:
        overrides["t_final"] = args.T
    if args.output_step is not None:
        overrides["output_step"] = args.output_step
    if args.re is not None:
        overrides["re"] = args.re
    mesh = None
    if args.mesh:
        from navierstokes_tpu.mesh.msh_io import read_msh
        mesh = read_msh(args.mesh)
    return build_solver(name, h=args.h, config=cfg, mesh=mesh,
                        mesh_kwargs=mesh_kwargs, **overrides)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="navierstokes_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list scenarios")

    p_run = sub.add_parser("run", help="run a scenario")
    p_run.add_argument("scenario", choices=sorted(SCENARIOS))
    p_run.add_argument("--restart-step", type=int, default=0)
    _add_common(p_run)

    p_post = sub.add_parser("postprocess",
                            help="replay checkpoints -> forces + VTU "
                                 "(src/postprocess.cpp parity)")
    p_post.add_argument("scenario", choices=sorted(SCENARIOS))
    p_post.add_argument("--t0", type=int, default=0)
    p_post.add_argument("--t1", type=int, default=20)
    p_post.add_argument("--step", type=int, default=2)
    _add_common(p_post)

    p_naca = sub.add_parser("sweep-naca",
                            help="angle-of-attack sweep "
                                 "(tests/2D/test_naca/run_test.sh parity)")
    p_naca.add_argument("--angles", type=float, nargs="+", required=True)
    p_naca.add_argument("--chord", type=float, default=0.4)
    p_naca.add_argument("--code", type=str, default="2408")
    _add_common(p_naca)

    args = ap.parse_args(argv)
    if args.cmd == "list":
        for name, sc in sorted(SCENARIOS.items()):
            print(f"{name:14s} {sc.description}")
        return 0

    _enable_cache()
    if args.cmd == "run":
        ns = _build(args, args.scenario)
        ns.setup()
        ns.solve(time_step=args.restart_step)
        print(f"final Cd = {ns.cd:.6f}, Cl = {ns.cl:.6f}")
        return 0

    if args.cmd == "postprocess":
        ns = _build(args, args.scenario)
        ns.setup()
        ns.post_process(args.t0, args.t1, args.step)
        return 0

    if args.cmd == "sweep-naca":
        for angle in args.angles:
            csv = f"output_{angle:g}.csv"
            args.csv = csv
            ns = _build(args, "2d-naca",
                        mesh_kwargs=dict(code=args.code, chord=args.chord,
                                         angle_deg=angle))
            ns.setup()
            ns.solve()
            print(f"angle {angle}: Cd = {ns.cd:.6f}, Cl = {ns.cl:.6f} "
                  f"-> {csv}")
        return 0
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
