"""Run-coalesced ELL design probe for the F matvec.

Idea: gathers are latency-bound (~per-row cost, width <=512B free), so cover
each 16-node block-row's column set with RUNS of L consecutive column blocks
and gather (L,32) contiguous slices via lax.gather slice_sizes. Value stream
inflates (run padding) but streams at ~650 GB/s; gather rows drop ~R/K-fold.

Usage:
  stats  — host: run-cover statistics on the real 1M-DoF graph
  bench  — chip: gather + full matvec timings vs current formulation
"""
import sys, time
import numpy as np


def run_cover(cols_set_per_row, L):
    """Greedy cover of each row's sorted col set by runs of length <= L.
    Returns list of (start, length) runs per row."""
    out = []
    for cs in cols_set_per_row:
        runs = []
        i = 0
        while i < len(cs):
            j = i + 1
            # extend while consecutive and within L
            while j < len(cs) and cs[j] - cs[i] < L and cs[j] == cs[j - 1] + 1:
                j += 1
            runs.append((cs[i], cs[j - 1] - cs[i] + 1))
            i = j
        out.append(runs)
    return out


def build_real_cols():
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
    bu = 16
    RB, CB = ri // bu, ci // bu
    bkey = np.unique(RB * np.int64(2 ** 32) + CB)
    rb = (bkey >> 32).astype(np.int64)
    cb = (bkey & 0xFFFFFFFF).astype(np.int64)
    n_rb = -(-space.n_p2 // bu)
    per_row = np.split(cb, np.searchsorted(rb, np.arange(1, n_rb)))
    return per_row, n_rb


def stats():
    per_row, n_rb = build_real_cols()
    K = max(len(c) for c in per_row)
    tot_blocks = sum(len(c) for c in per_row)
    print(f"n_rb={n_rb} K_max={K} mean_blocks={tot_blocks/n_rb:.1f}")
    for L in (2, 4, 8):
        covers = run_cover(per_row, L)
        nr = np.array([len(r) for r in covers])
        slots = np.array([sum(l for _, l in r) for r in covers])
        # padded-ELL shape: Rmax runs x L slots each
        print(f"L={L}: runs mean {nr.mean():.2f} max {nr.max()}  "
              f"ELL(R*L) {n_rb*nr.max()*L*16*16*4/1e6:.0f} MB  "
              f"gather rows {n_rb*nr.max()/1e3:.0f}k "
              f"({n_rb*nr.max()*L*64/1e6:.0f} MB moved)")
        # degree-bucketed: sort rows by #runs, report 90/99 pct
        print(f"      runs p50 {np.percentile(nr,50):.0f} p90 {np.percentile(nr,90):.0f} "
              f"p99 {np.percentile(nr,99):.0f}")


def bench():
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    n_vb, K = 28160, 16
    x = jnp.asarray(rng.standard_normal((n_vb, 32)).astype(np.float32))

    def timed(name, prog, args, N=48, rep=3):
        prog = jax.jit(prog)
        out = prog(*args); float(np.asarray(out).reshape(-1)[0])
        best = None
        for _ in range(rep):
            t0 = time.perf_counter()
            out = prog(*args); float(np.asarray(out).reshape(-1)[0])
            dt = (time.perf_counter() - t0) / N
            best = dt if best is None else min(best, dt)
        print(f"{name:58s} {best*1e3:8.3f} ms", flush=True)

    # 1. gather-rate curve: plain take vs lax.gather slice_sizes L rows
    import functools
    for L, n_idx in ((1, 450560), (2, 225280), (4, 112640), (8, 56320)):
        starts = jnp.asarray(
            rng.integers(0, n_vb - L, (n_idx, 1)).astype(np.int32))
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,))
        def g(x, starts, L=L, dn=dn):
            def body(c, _):
                xg = jax.lax.gather(
                    c, starts, dn, slice_sizes=(L, 32),
                    mode=jax.lax.GatherScatterMode.CLIP)
                y = xg.sum(axis=(0, 1)) * 1e-6 + c[0] * 0
                return c * 1.0000001 + y[None, :] * 1e-9, None
            c, _ = jax.lax.scan(body, x, None, length=48)
            return c
        timed(f"lax.gather slice ({L},32) x{n_idx} [{n_idx*L*128/1e6:.0f}MB]",
              g, (x, starts))

    # 2. full run-matvec candidate at L=4, R=6 (shape from stats) vs current
    L, R = 4, 6
    starts = jnp.asarray(rng.integers(0, n_vb - L, (n_vb * R, 1)).astype(np.int32))
    vals_run = jnp.asarray(
        rng.standard_normal((n_vb, R * L, 16, 16)).astype(np.float32))
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))

    def mv_run(xv, vals):
        xb = xv.reshape(n_vb, 32)
        xg = jax.lax.gather(xb, starts, dn, slice_sizes=(L, 32),
                            mode=jax.lax.GatherScatterMode.CLIP)
        xg = jax.lax.optimization_barrier(xg)
        xg = xg.reshape(n_vb, R * L, 16, 2)
        y = (vals[..., None] * xg[:, :, None]).sum(axis=(1, 3))
        return y.reshape(-1, 2)
    x0 = jnp.asarray(rng.standard_normal((n_vb * 16, 2)).astype(np.float32))

    def prog_run(x0, vals):
        def body(c, _):
            y = mv_run(c, vals)
            return y * 1e-3, None
        c, _ = jax.lax.scan(body, x0, None, length=48)
        return c
    timed(f"run-matvec L={L} R={R} ({n_vb*R/1e3:.0f}k gathers, "
          f"{n_vb*R*L*16*16*4/1e6:.0f}MB vals)", prog_run, (x0, vals_run))

    # 3. same but values bf16 (f32 accumulate via explicit cast)
    vals_bf = vals_run.astype(jnp.bfloat16)
    def mv_run_bf(xv, vals):
        xb = xv.reshape(n_vb, 32)
        xg = jax.lax.gather(xb, starts, dn, slice_sizes=(L, 32),
                            mode=jax.lax.GatherScatterMode.CLIP)
        xg = jax.lax.optimization_barrier(xg)
        xg = xg.reshape(n_vb, R * L, 16, 2)
        y = (vals.astype(jnp.float32)[..., None] * xg[:, :, None]).sum(axis=(1, 3))
        return y.reshape(-1, 2)
    def prog_bf(x0, vals):
        def body(c, _):
            y = mv_run_bf(c, vals)
            return y * 1e-3, None
        c, _ = jax.lax.scan(body, x0, None, length=48)
        return c
    timed("run-matvec bf16 vals", prog_bf, (x0, vals_bf))


if __name__ == "__main__":
    {"stats": stats, "bench": bench}[sys.argv[1]]()
