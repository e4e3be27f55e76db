"""Band/window coverage of the velocity block graph under Hilbert ordering.

Host-only (numpy).  Decides the windowed F-matvec design: what fraction of
block couplings fall inside a contiguous block-column window per tile of
block rows, for various tile sizes T and window spans, and how much spills
to an overflow ELL.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from navierstokes_tpu.mesh.geometry import Mesh
from navierstokes_tpu.fem.spaces import TaylorHoodSpace

z = np.load(os.path.join(os.path.dirname(__file__), "..", ".bench_mesh.npz"))
mesh = Mesh(2, z["points"], z["cells"], z["bfaces"], z["btags"])
t0 = time.time()
space = TaylorHoodSpace(mesh, 2, 1)
print(f"space: n_p2={space.n_p2} ({time.time()-t0:.1f}s)", flush=True)

bu = 16
cp2 = np.asarray(space.cell_p2, dtype=np.int64)
nc, nv = cp2.shape
rows = np.repeat(cp2, nv, axis=1).reshape(-1) // bu
cols = np.tile(cp2, (1, nv)).reshape(-1) // bu
n_vb = -(-space.n_p2 // bu)
key = rows * np.int64(n_vb + 1) + cols
uk = np.unique(key)
R = (uk // (n_vb + 1)).astype(np.int64)
C = (uk % (n_vb + 1)).astype(np.int64)
print(f"n_vb={n_vb}  unique block pairs={len(uk)}  "
      f"mean slots/row={len(uk)/n_vb:.2f}", flush=True)

d = C - R
for w in (4, 8, 12, 16, 24, 32, 48, 64):
    frac = np.mean(np.abs(d) <= w)
    print(f"|c-r| <= {w:3d}: {frac*100:6.2f}% of slots", flush=True)

# Tile-window scheme: tiles of T block rows, window = [t0-W, t0+T+W)
for T in (8, 16, 32):
    for W in (8, 16, 24, 32):
        tile = R // T
        lo = tile * T - W
        hi = tile * T + T + W
        inw = (C >= lo) & (C < hi)
        n_out = int((~inw).sum())
        rows_out = np.unique(R[~inw])
        # overflow ELL K: max out-of-window slots per row
        if n_out:
            cnt = np.bincount(R[~inw], minlength=n_vb)
            kmax, kmean = int(cnt.max()), float(cnt[cnt > 0].mean())
        else:
            kmax = kmean = 0
        span = T + 2 * W
        fill = len(uk) - n_out
        waste = n_vb * span / max(fill, 1)
        print(f"T={T:3d} W={W:3d} span={span:3d}: out={n_out} "
              f"({n_out/len(uk)*100:.2f}%) rows_w_ovf={len(rows_out)} "
              f"Kovf max={kmax} mean={kmean:.1f} "
              f"stored/used={waste:.2f}x", flush=True)

# Adaptive per-tile window: span needed to cover ALL slots of the tile
for T in (8, 16, 32):
    tile = R // T
    ntile = n_vb // T + (n_vb % T > 0)
    lo = np.full(ntile, np.iinfo(np.int64).max)
    hi = np.full(ntile, np.iinfo(np.int64).min)
    np.minimum.at(lo, tile, C)
    np.maximum.at(hi, tile, C)
    span = hi - lo + 1
    # and with the top q% of columns (per tile) spilled to overflow
    print(f"T={T:3d} adaptive span percentiles: "
          f"p50={np.percentile(span,50):.0f} p90={np.percentile(span,90):.0f} "
          f"p99={np.percentile(span,99):.0f} max={span.max()}", flush=True)
