from navierstokes_tpu.fem.quadrature import gauss_simplex  # noqa: F401
from navierstokes_tpu.fem.reference_elements import ReferenceSimplex  # noqa: F401
from navierstokes_tpu.fem.spaces import TaylorHoodSpace  # noqa: F401
