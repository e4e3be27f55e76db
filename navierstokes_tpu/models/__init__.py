from navierstokes_tpu.models.navier_stokes import NavierStokes  # noqa: F401
from navierstokes_tpu.models.stokes import StokesSolver  # noqa: F401
