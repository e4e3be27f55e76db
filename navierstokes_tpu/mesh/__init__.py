from navierstokes_tpu.mesh.geometry import Mesh  # noqa: F401
from navierstokes_tpu.mesh.msh_io import read_msh, write_msh  # noqa: F401
from navierstokes_tpu.mesh.generators import (  # noqa: F401
    channel_with_cylinder_2d,
    duct_with_box_obstacle_3d,
    duct_with_cylinder_3d,
    naca_channel_2d,
    rectangle_2d,
    box_3d,
)
