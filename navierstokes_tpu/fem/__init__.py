from navierstokes_tpu.fem.quadrature import gauss_simplex  # noqa: F401
from navierstokes_tpu.fem.reference_elements import ReferenceSimplex  # noqa: F401


def __getattr__(name):
    # lazy: fem.spaces imports mesh.geometry which imports
    # fem.reference_elements — avoid the package-level cycle
    if name == "TaylorHoodSpace":
        from navierstokes_tpu.fem.spaces import TaylorHoodSpace
        return TaylorHoodSpace
    raise AttributeError(name)
