from navierstokes_tpu.utils.csv_logger import ForcesCsv  # noqa: F401
from navierstokes_tpu.utils.vtu import write_vtu_pvtu  # noqa: F401
from navierstokes_tpu.utils.checkpoint import (  # noqa: F401
    export_state, import_state, checkpoint_path)
