"""dt sweep of the projection scheme at the 1M-DoF bench point.

Goal (VERDICT round-2 items 1+3): find the operating point where the
physics-validated BDF2 rotational pressure-correction scheme (in-band
Schaefer-Turek 2D-2 coefficients at CFL <~ 2, VALIDATION.md) ALSO clears
the >=1.25 steps/s throughput bar, so the headline bench point is a
validated-physics point.

Reuses one setup across dt values (setup costs ~6 min at 1M DoF over the
tunneled chip); per dt it rebuilds the static operator, resets the state
and measures steps/s over steps 11..N.

Usage: python scripts/exp_dt.py [dt ...]   (default sweep below)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STEPS = int(os.environ.get("STEPS", "30"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    dts = [float(x) for x in sys.argv[1:]] or [0.0025, 0.00125, 0.000625]

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_nstpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from navierstokes_tpu.config import InletConfig, SolverConfig
    from navierstokes_tpu.mesh.geometry import Mesh
    from navierstokes_tpu.models.navier_stokes import NavierStokes

    z = np.load(os.path.join(os.path.dirname(__file__), "..",
                             ".bench_mesh.npz"))
    mesh = Mesh(2, z["points"], z["cells"], z["bfaces"], z["btags"])
    inlet = InletConfig(kind="parabolic", u_m=1.5, height=0.41)
    # ST-true 2D-2 physics (nu=1e-3 -> Re=100 shedding), the configuration
    # the validated-physics bench point will run
    cfg = SolverConfig(dtype="float32", nu=1.0e-3, ref_length=0.1,
                       force_formula="st",
                       output_dir="/tmp/exp_out",
                       cache_dir="/tmp/exp_cache",
                       csv_path="/tmp/exp_forces.csv",
                       scheme="projection", proj_bdf2=True)
    over = os.environ.get("NS_OVERRIDES")
    if over:
        for k, v in json.loads(over).items():
            setattr(cfg, k, v)
        log(f"overrides: {over}")
    ns = NavierStokes(mesh, 2, 1, deltat=dts[0], T=1.0, step=10,
                      inlet=inlet, config=cfg)
    ns.set_re_number(100)
    t0 = time.time()
    ns.setup()
    log(f"setup {time.time() - t0:.0f}s; DoFs {ns.space.n_dofs}")

    results = {}
    for dt in dts:
        ns.config.deltat = dt
        ns._build_static()
        ns._chunks = {}
        ns._init_state(0)
        params = ns._params()
        run = ns._chunk_fn(1)
        u, p, up, phi, t = (ns._u, ns._p, ns._u_prev, ns._phi,
                    jnp.asarray(0.0, ns.dtype))
        iters, res = [], []
        t_meas = None
        for k in range(STEPS):
            if k == 10:
                t_meas = time.time()
            u, p, up, phi, t, ms = run(params, u, p, up, phi, t)
            iters.append(int(ms.iterations[0]))
            res.append(float(ms.residual[0]))
        rate = (STEPS - 10) / (time.time() - t_meas)
        fin = bool(jnp.isfinite(u).all())
        results[str(dt)] = dict(steps_per_s=round(rate, 3), iters=iters,
                                res_last=f"{res[-1]:.1e}", finite=fin,
                                cd=round(float(ms.cd[0]), 4))
        log(f"dt={dt}: {rate:.3f} steps/s  iters={iters[-8:]} "
            f"res={res[-1]:.1e} finite={fin} cd={results[str(dt)]['cd']}")
        # Newton-seed guard at the developed state: r = max tile row-sum
        # of (I - F X0); Newton path taken iff r < 0.9 (ops/p1ell.py
        # block_jacobi_invert)
        if params.bj_x0 is not None:
            from navierstokes_tpu.ops import bsr as B
            from navierstokes_tpu.ops.p1ell import block_jacobi_tiles

            @jax.jit
            def guard_r(u_dev, up_dev):
                ul = (2.0 * u_dev - up_dev if ns.config.proj_bdf2
                      else u_dev)
                f_blk = params.a0_cell + ns._ops.convection(params, ul)
                mflat = ns.bc.mask[:, 0]
                d = B.f_diag(ns.ell, f_blk)
                sig = (jnp.sum(d * mflat)
                       / jnp.maximum(jnp.sum(mflat), 1.0))
                a = block_jacobi_tiles(params.bj_plan, f_blk, mflat, sig)
                ax = jnp.matmul(a, params.bj_x0.astype(jnp.float32),
                                preferred_element_type=jnp.float32)
                eye = jnp.eye(a.shape[-1], dtype=jnp.float32)
                return jnp.abs(eye[None] - ax).sum(-1).max()
            try:
                r = float(guard_r(u, up))
                results[str(dt)]["guard_r"] = round(r, 3)
                log(f"  newton guard r = {r:.3f} "
                    f"({'newton' if r < 0.9 else 'LU fallback'})")
            except Exception as e:
                log(f"  guard probe failed: {e}")

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
