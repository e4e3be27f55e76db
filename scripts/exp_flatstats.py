"""Host stats for the flat row-major F layout + blocked convection scatter.

Measures on the real 1M-DoF bench graph:
  1. block-row degree distribution -> storage for K0 in {8, 11, 16}
     under the overflow split (virtual rows chunked at K0);
  2. (cell -> block-pair) contribution counts -> size of the blocked
     convection segment-sum.
"""
import sys, os
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from navierstokes_tpu.fem.spaces import TaylorHoodSpace
from navierstokes_tpu.mesh.geometry import Mesh

z = np.load(os.path.join(os.path.dirname(__file__), "..", ".bench_mesh.npz"))
mesh = Mesh(2, z["points"], z["cells"], z["bfaces"], z["btags"])
mesh.reorder_spatial()
space = TaylorHoodSpace(mesh, 2, 1)
cp2 = np.asarray(space.cell_p2, dtype=np.int64)
nc, nv = cp2.shape
bu = 16
n_vb = -(-space.n_p2 // bu)

rows = np.repeat(cp2, nv, axis=1).reshape(-1)
cols = np.tile(cp2, (1, nv)).reshape(-1)
RI, CJ = rows // bu, cols // bu
key = RI * np.int64(n_vb + 1) + CJ
uk = np.unique(key)
deg = np.bincount((uk // (n_vb + 1)).astype(np.int64), minlength=n_vb)
print(f"n_vb={n_vb} pairs={len(uk)} deg: mean={deg.mean():.2f} "
      f"max={deg.max()}")
for q in (50, 75, 90, 95, 99):
    print(f"  p{q}: {np.percentile(deg, q):.0f}")
hist = np.bincount(deg)
print("deg hist:", {i: int(c) for i, c in enumerate(hist) if c})

for K0 in (8, 11, 16):
    # virtual rows: one per (row, chunk) with spill
    spill = np.maximum(deg - K0, 0)
    n_virt = int(np.ceil(spill / K0).sum())
    n_ext = n_vb + n_virt
    mb = n_ext * K0 * bu * bu * 4 / 1e6
    gathers = n_ext * K0
    print(f"K0={K0:3d}: n_virt={n_virt} n_ext={n_ext} "
          f"storage={mb:.0f} MB  gather_rows={gathers}")

# 2. (cell, block-pair) contributions
rb = np.sort(cp2 // bu, axis=1)
nrow_blocks = (np.diff(rb, axis=1) != 0).sum(axis=1) + 1
print("row-blocks per cell hist:",
      {i: int(c) for i, c in enumerate(np.bincount(nrow_blocks)) if c})
# distinct (row_block, col_block) pairs per cell
npairs = np.array([nrow_blocks * nrow_blocks]).sum()  # upper bound
# exact:
cell_ids = np.repeat(np.arange(nc, dtype=np.int64), nv * nv)
pkey = cell_ids * np.int64((n_vb + 1) ** 2) + key
ucp = len(np.unique(pkey))
print(f"exact (cell, blockpair) contributions: {ucp} "
      f"({ucp/nc:.2f}/cell) -> {ucp*256*4/1e6:.0f} MB block rows")
