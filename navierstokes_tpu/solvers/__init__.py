from navierstokes_tpu.solvers.krylov import cg, fgmres, gmres  # noqa: F401
