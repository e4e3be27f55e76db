from navierstokes_tpu.solvers.krylov import (  # noqa: F401
    bicgstab, cg, fgmres, gmres)
from navierstokes_tpu.solvers.preconditioners import (  # noqa: F401
    InnerSolve, make_asimple, make_ayosida, make_cahouet_chabard,
    make_identity)
