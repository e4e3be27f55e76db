from navierstokes_tpu.ops.assembly import (  # noqa: F401
    CellArrays, FaceArrays, build_cell_arrays, build_face_arrays)
from navierstokes_tpu.ops.operators import (  # noqa: F401
    Scatter, build_scatter, convection_matrices, apply_blocks, f_diag,
    mass_apply)
