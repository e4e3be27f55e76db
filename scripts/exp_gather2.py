"""Build ELL col tables at several block granularities from the real
bench graph (host), then measure honest (scan-chained) gather rates on
chip as a function of row width/lane-alignment.

Usage: stats | bench
"""
import sys, time
import numpy as np

def stats():
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
    out = {"n_p2": space.n_p2}
    for bu in (8, 16, 32, 64, 128):
        RB, CB = ri // bu, ci // bu
        bkey = np.unique(RB * np.int64(2**32) + CB)
        rb = (bkey >> 32).astype(np.int64)
        cb = (bkey & 0xFFFFFFFF).astype(np.int64)
        n_rb = -(-space.n_p2 // bu)
        n_rb = -(-n_rb // 128) * 128
        counts = np.bincount(rb, minlength=n_rb)
        K = int(counts.max())
        table = np.zeros((n_rb, K), dtype=np.int32)
        start = np.zeros(n_rb + 1, np.int64); np.cumsum(counts, out=start[1:])
        kof = np.arange(len(rb)) - start[rb]
        table[rb, kof] = cb
        # pad slots replicate the row's own index (in-range, harmless)
        pad = np.arange(n_rb, dtype=np.int32)[:, None] * 0 + table[:, :1]
        m = np.arange(K)[None, :] >= counts[:, None]
        table = np.where(m, pad, table)
        out[f"cols{bu}"] = table
        print(f"bu={bu}: table ({n_rb},{K}) = {n_rb*K} gathers")
    np.savez("/tmp/gather_tables.npz", **out)
    print("saved /tmp/gather_tables.npz")

def bench():
    import jax, jax.numpy as jnp
    z = np.load("/tmp/gather_tables.npz")
    n_p2 = int(z["n_p2"]); D = 2
    rng = np.random.default_rng(0)

    def timed(name, make_prog, arg, n_items, N=48, rep=2):
        prog = jax.jit(make_prog(N))
        out = prog(arg); float(np.asarray(out).reshape(-1)[0])
        best = None
        for _ in range(rep):
            t0 = time.perf_counter()
            out = prog(arg); float(np.asarray(out).reshape(-1)[0])
            dt = (time.perf_counter() - t0) / N
            best = dt if best is None else min(best, dt)
        print(f"{name:48s} {best*1e3:8.3f} ms  {best/n_items*1e9:6.2f} ns/row",
              flush=True)

    for bu in (8, 16, 32, 64, 128):
        cols = jnp.asarray(z[f"cols{bu}"])
        n_rb, K = cols.shape
        x0 = jnp.asarray(rng.standard_normal((n_rb * bu, D)).astype(np.float32))
        W = bu * D
        # (bu, D) slice shape (current pattern)
        def mk_a(N, cols=cols, n_rb=n_rb, bu=bu):
            def prog(x):
                def body(xc, _):
                    xb = xc.reshape(n_rb, bu, D)
                    xg = jnp.take(xb, cols, axis=0, mode="clip")
                    y = xg.sum(axis=1) * 1e-3
                    return y.reshape(-1, D), None
                xc, _ = jax.lax.scan(body, x, None, length=N)
                return xc[0]
            return prog
        timed(f"bu={bu:3d} slice (bu,{D})  [{n_rb}x{K}]", mk_a, x0, n_rb * K)
        # interleaved flat rows of W lanes
        def mk_b(N, cols=cols, n_rb=n_rb, W=W):
            def prog(x):
                def body(xc, _):
                    xb = xc.reshape(n_rb, W)
                    xg = jnp.take(xb, cols, axis=0, mode="clip")
                    y = xg.sum(axis=1) * 1e-3
                    return y, None
                xc, _ = jax.lax.scan(body, x.reshape(n_rb, W), None, length=N)
                return xc[0]
            return prog
        timed(f"bu={bu:3d} flat {W:4d}B-lane rows", mk_b, x0, n_rb * K)

if __name__ == "__main__":
    {"stats": stats, "bench": bench}[sys.argv[1]]()
