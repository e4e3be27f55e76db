from navierstokes_tpu.parallel.sharding import (  # noqa: F401
    cell_partitioning, device_mesh)
