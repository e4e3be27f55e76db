"""Ordering experiment: Morton vs Hilbert; nodal-band / block-K statistics
for the F (P2-P2), G (P2-P1) and B (P1-P2) graphs on the bench mesh."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _part1by1(x):
    x = x.astype(np.uint64)
    x &= np.uint64(0x00000000FFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def hilbert_order(points, bits=16):
    """Permutation sorting points along a Hilbert curve (Skilling)."""
    pts = np.asarray(points, dtype=np.float64)
    lo = pts.min(axis=0)
    span = np.maximum(pts.max(axis=0) - lo, 1e-300)
    n = pts.shape[1]
    X = ((pts - lo) / span * ((1 << bits) - 1)).astype(np.uint64)
    X = X.copy()
    M = np.uint64(1) << np.uint64(bits - 1)
    # AxesToTranspose (Skilling 2004), vectorized
    Q = M
    while Q > np.uint64(1):
        P = Q - np.uint64(1)
        for i in range(n):
            mask = (X[:, i] & Q) != 0
            X[mask, 0] ^= P
            nm = ~mask
            t = (X[nm, 0] ^ X[nm, i]) & P
            X[nm, 0] ^= t
            X[nm, i] ^= t
        Q >>= np.uint64(1)
    for i in range(1, n):
        X[:, i] ^= X[:, i - 1]
    t = np.zeros(len(X), dtype=np.uint64)
    Q = M
    while Q > np.uint64(1):
        mask = (X[:, n - 1] & Q) != 0
        t[mask] ^= Q - np.uint64(1)
        Q >>= np.uint64(1)
    for i in range(n):
        X[:, i] ^= t
    if n == 2:
        key = (_part1by1(X[:, 0]) << np.uint64(1)) | _part1by1(X[:, 1])
    else:
        from navierstokes_tpu.mesh.geometry import _part1by2
        key = ((_part1by2(X[:, 0]) << np.uint64(2))
               | (_part1by2(X[:, 1]) << np.uint64(1)) | _part1by2(X[:, 2]))
    return np.argsort(key, kind="stable")


def pair_stats(name, rows, cols, bu, bv, n_rb, bands=(2, 3, 4, 6, 8)):
    RI = (rows // bu).astype(np.int64)
    CJ = (cols // bv).astype(np.int64)
    key = RI * np.int64(10**10) + CJ
    uk = np.unique(key)
    ru = uk // 10**10
    cu = uk % 10**10
    counts = np.bincount(ru, minlength=n_rb)
    d = cu - ru
    tot = len(uk)
    print(f"{name}: block pairs {tot} K(mean/max) = "
          f"{tot/n_rb:.1f}/{counts.max()}")
    for W in bands:
        inb = np.abs(d) <= W
        # escapes per row
        esc = np.bincount(ru[~inb], minlength=n_rb)
        print(f"   band W={W}: covers {inb.mean()*100:.1f}% of pairs; "
              f"escape K(mean/max) = {esc.mean():.2f}/{esc.max()}")


def nodal_stats(name, rows, cols, radii=(8, 16, 24, 32, 48, 64)):
    key = rows.astype(np.int64) * np.int64(2**32) + cols
    uk = np.unique(key)
    r = uk // 2**32
    c = uk % 2**32
    d = np.abs(c - r)
    print(f"{name}: true nnz {len(uk)} ({len(uk)/ (r.max()+1):.1f}/row)")
    for R in radii:
        print(f"   nodal band R={R}: covers {(d <= R).mean()*100:.1f}%")


def analyze(tag, space):
    cp2 = np.asarray(space.cell_p2, dtype=np.int64)
    cp1 = np.asarray(space.cell_p1, dtype=np.int64)
    nv = cp2.shape[1]
    npp = cp1.shape[1]
    f_rows = np.repeat(cp2, nv, axis=1).ravel()
    f_cols = np.tile(cp2, (1, nv)).ravel()
    n_vb = -(-space.n_p2 // 16)
    n_pb = -(-space.n_p1 // 16)
    print(f"== {tag} ==")
    nodal_stats("F", f_rows, f_cols)
    pair_stats("F blk16", f_rows, f_cols, 16, 16, n_vb)
    g_rows = np.repeat(cp2, npp, axis=1).ravel()
    g_cols = np.tile(cp1, (1, nv)).ravel()
    pair_stats("G blk16 (p-cols blk16)", g_rows, g_cols, 16, 16, n_vb)
    b_rows = np.repeat(cp1, nv, axis=1).ravel()
    b_cols = np.tile(cp2, (1, npp)).ravel()
    pair_stats("B blk16 (u-cols blk16)", b_rows, b_cols, 16, 16, n_pb)
    print(flush=True)


def main():
    from bench import build_mesh
    from navierstokes_tpu.fem.spaces import TaylorHoodSpace
    import navierstokes_tpu.mesh.geometry as G

    mesh = build_mesh()
    mesh2 = build_mesh()

    mesh.reorder_spatial()
    sp = TaylorHoodSpace(mesh, 2, 1)   # morton (current)
    analyze("morton", sp)

    # hilbert: monkeypatch
    G.morton_order = lambda pts: hilbert_order(pts)
    mesh2.reorder_spatial()
    sp2 = TaylorHoodSpace(mesh2, 2, 1)
    analyze("hilbert", sp2)


if __name__ == "__main__":
    main()


def analyze2(tag, space):
    cp2 = np.asarray(space.cell_p2, dtype=np.int64)
    cp1 = np.asarray(space.cell_p1, dtype=np.int64)
    nv, npp = cp2.shape[1], cp1.shape[1]
    print(f"== {tag} (narrow col blocks) ==")
    n_vb8 = -(-space.n_p2 // 8)
    f_rows = np.repeat(cp2, nv, axis=1).ravel()
    f_cols = np.tile(cp2, (1, nv)).ravel()
    pair_stats("F blk8", f_rows, f_cols, 8, 8, n_vb8, bands=())
    n_vb = -(-space.n_p2 // 16)
    n_pb = -(-space.n_p1 // 16)
    g_rows = np.repeat(cp2, npp, axis=1).ravel()
    g_cols = np.tile(cp1, (1, nv)).ravel()
    for bc in (4, 8):
        pair_stats(f"G u-blk16 x p-blk{bc}", g_rows, g_cols, 16, bc, n_vb,
                   bands=())
    b_rows = np.repeat(cp1, nv, axis=1).ravel()
    b_cols = np.tile(cp2, (1, npp)).ravel()
    for bc in (4, 8):
        pair_stats(f"B p-blk16 x u-blk{bc}", b_rows, b_cols, 16, bc, n_pb,
                   bands=())
    # Ap graph = P1-P1 adjacency
    p_rows = np.repeat(cp1, npp, axis=1).ravel()
    p_cols = np.tile(cp1, (1, npp)).ravel()
    pair_stats("Ap p-blk16 x p-blk16", p_rows, p_cols, 16, 16, n_pb,
               bands=())
    pair_stats("Ap p-blk16 x p-blk4", p_rows, p_cols, 16, 4, n_pb, bands=())


def main2():
    from bench import build_mesh
    import navierstokes_tpu.mesh.geometry as G
    from navierstokes_tpu.fem.spaces import TaylorHoodSpace
    mesh2 = build_mesh()
    G.morton_order = lambda pts: hilbert_order(pts)
    mesh2.reorder_spatial()
    sp2 = TaylorHoodSpace(mesh2, 2, 1)
    analyze2("hilbert", sp2)


if __name__ == "__main__":
    pass
