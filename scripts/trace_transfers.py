"""Find host<->device transfer call sites in NavierStokes.setup().

Monkeypatches jax.Array.__array__ (device -> host pullback) to print a
stack snippet for any transfer above a size threshold, then runs a
small bench-shaped setup.  Call sites, not timings, are the product —
run at small h so the tunnel cost stays low.
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_nstpu"))

THRESH = 64 * 1024  # bytes

from jax._src import array as _jarray

_orig = _jarray.ArrayImpl.__array__


def _traced(self, *a, **k):
    nb = self.size * self.dtype.itemsize
    if nb >= THRESH:
        frames = [f for f in traceback.extract_stack()
                  if "/repo/" in f.filename and "trace_transfers" not in
                  f.filename]
        where = " <- ".join(f"{os.path.basename(f.filename)}:{f.lineno}"
                            for f in frames[-4:])
        print(f"[PULLBACK {nb/1e6:8.2f} MB {self.shape} {self.dtype}] "
              f"{where}", flush=True)
    return _orig(self, *a, **k)


_jarray.ArrayImpl.__array__ = _traced


def main():
    from navierstokes_tpu.config import InletConfig, SolverConfig
    from navierstokes_tpu.mesh.generators import channel_with_cylinder_2d
    from navierstokes_tpu.models.navier_stokes import NavierStokes

    mesh = channel_with_cylinder_2d(h=0.03, h_near=0.01)
    inlet = InletConfig(kind="parabolic", u_m=1.5, height=0.41)
    cfg = SolverConfig(dtype="float32", output_dir="/tmp/trace_out",
                       cache_dir="/tmp/trace_cache", csv_path="/tmp/tr.csv",
                       scheme="projection", proj_bdf2=True,
                       deltat=0.0025, t_final=0.01)
    ns = NavierStokes(mesh=mesh, inlet=inlet, config=cfg)
    ns.set_re_number(100.0)
    import time
    t0 = time.perf_counter()
    ns.setup()
    print(f"setup {time.perf_counter()-t0:.1f}s  DoFs "
          f"{ns.space.n_p2*ns.dim + ns.space.n_p1}", flush=True)


if __name__ == "__main__":
    main()
