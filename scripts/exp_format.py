"""Host-side format-design statistics on the real 1M-DoF bench graph.

Decides the F-matvec storage format: ELL occupancy vs block size,
diagonal-tile (BJ tile) coverage for a dense-diag + sparse-remainder
split, and the remainder's ELL shape.
"""
import numpy as np

z = np.load("/tmp/fused_graph.npz")
n_p2 = int(z["n_p2"])

# rebuild the scalar nnz pattern from the bu=16 table? No - recompute from mesh
from navierstokes_tpu.fem.spaces import TaylorHoodSpace
from navierstokes_tpu.mesh.geometry import Mesh
zm = np.load("/root/repo/.bench_mesh.npz")
mesh = Mesh(2, zm["points"], zm["cells"], zm["bfaces"], zm["btags"])
mesh.reorder_spatial()
space = TaylorHoodSpace(mesh, 2, 1)
cp2 = np.asarray(space.cell_p2, dtype=np.int64)
nv = cp2.shape[1]
rows = np.repeat(cp2, nv, axis=1).reshape(-1)
cols = np.tile(cp2, (1, nv)).reshape(-1)
key = np.unique(rows * np.int64(space.n_p2) + cols)
ri = (key // space.n_p2).astype(np.int64)
ci = (key % space.n_p2).astype(np.int64)
nnz = len(key)
print(f"n_p2={space.n_p2}  nnz={nnz} ({nnz/space.n_p2:.1f}/row) "
      f"values={nnz*4/1e6:.0f} MB")

for bu in (4, 8, 16, 32):
    RB, CB = ri // bu, ci // bu
    bkey = np.unique(RB * np.int64(2**32) + CB)
    rb = (bkey >> 32).astype(np.int64)
    n_rb = -(-space.n_p2 // bu)
    counts = np.bincount(rb, minlength=n_rb)
    n_pairs = len(bkey)
    ell = n_rb * counts.max() * bu * bu * 4 / 1e6
    csr = n_pairs * bu * bu * 4 / 1e6
    print(f"bu={bu:3d}: pairs={n_pairs} K mean {counts.mean():.1f} max "
          f"{counts.max()}, ELL {ell:.0f} MB, CSRb {csr:.0f} MB, "
          f"occ {nnz/(n_pairs*bu*bu)*100:.1f}%")

# dense diagonal tiles (BJ tiles) of S nodes + remainder
for S in (128, 256, 512):
    ti, tj = ri // S, ci // S
    in_tile = ti == tj
    n_t = -(-space.n_p2 // S)
    frac = in_tile.mean()
    print(f"\ntile S={S}: in-tile nnz {frac*100:.1f}%  dense tiles "
          f"{n_t*S*S*4/1e6:.0f} MB (occ {nnz*frac/(n_t*S*S)*100:.1f}%)")
    # remainder as bu=16 blocked ELL
    er, ec = ri[~in_tile], ci[~in_tile]
    for bu in (8, 16):
        RB, CB = er // bu, ec // bu
        bkey = np.unique(RB * np.int64(2**32) + CB)
        rb = (bkey >> 32).astype(np.int64)
        n_rb = -(-space.n_p2 // bu)
        counts = np.bincount(rb, minlength=n_rb)
        nz_rows = (counts > 0).sum()
        print(f"  R bu={bu}: pairs={len(bkey)} K max {counts.max()} "
          f"mean-of-nonzero {counts[counts>0].mean():.1f} "
          f"rows-with-escape {nz_rows}/{n_rb} "
          f"ELL {n_rb*counts.max()*bu*bu*4/1e6:.0f} MB "
          f"CSRb {len(bkey)*bu*bu*4/1e6:.0f} MB")

# scalar node-ELL shape
counts_n = np.bincount(ri, minlength=space.n_p2)
print(f"\nnode-ELL: K max {counts_n.max()} mean {counts_n.mean():.1f} "
      f"vals {space.n_p2*counts_n.max()*4/1e6:.0f} MB")
