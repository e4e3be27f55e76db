"""Fused-F-matvec design measurements (round 3).

Subcommands:
  stats  — host-only: real bench-mesh sparsity statistics that decide the
           kernel design (block-ELL occupancy at bu=16/32, nodal band
           coverage after Hilbert ordering).  Writes /tmp/fused_graph.npz
           with the real block tables for the kernel benchmarks.
  bench  — on-chip: candidate Pallas kernels vs the current XLA apply_f,
           on the REAL f_cols distribution.

Measured (stats, 1M-DoF bench mesh): nodal nnz 5.16M (11.5/row, 21 MB);
band R=16/256 covers only 62%/90% of nnz -> DIA/banded formats are out.
bu=16 ELL: K mean 9.5 / max 16 (461 MB, 7.6% occupancy).
"""

import sys
import time

import numpy as np


def stats():
    from navierstokes_tpu.fem.spaces import TaylorHoodSpace
    from navierstokes_tpu.mesh.geometry import Mesh

    z = np.load("/root/repo/.bench_mesh.npz")
    mesh = Mesh(2, z["points"], z["cells"], z["bfaces"], z["btags"])
    t0 = time.time()
    mesh.reorder_spatial()
    space = TaylorHoodSpace(mesh, 2, 1)
    print(f"space: {space.n_p2} P2 nodes, {space.n_p1} P1, "
          f"{mesh.n_cells} cells  ({time.time()-t0:.0f}s)")

    cp2 = np.asarray(space.cell_p2, dtype=np.int64)
    nv = cp2.shape[1]
    rows = np.repeat(cp2, nv, axis=1).reshape(-1)
    cols = np.tile(cp2, (1, nv)).reshape(-1)
    key = np.unique(rows * np.int64(space.n_p2) + cols)
    ri = key // space.n_p2
    ci = key % space.n_p2
    nnz = len(key)
    print(f"nodal nnz = {nnz}  ({nnz/space.n_p2:.1f}/row)  "
          f"values-only = {nnz*4/1e6:.0f} MB")

    dist = np.abs(ri - ci)
    for R in (16, 32, 64, 128, 256, 512):
        inb = dist <= R
        esc_rows = np.unique(ri[~inb])
        esc_per_row = np.bincount(ri[~inb], minlength=space.n_p2)
        print(f"  band R={R:4d}: covers {inb.mean()*100:6.2f}% of nnz; "
              f"escape rows {len(esc_rows)} "
              f"({len(esc_rows)/space.n_p2*100:.2f}%), "
              f"esc/row max {esc_per_row.max()}")

    for bu in (8, 16, 32):
        RB = ri // bu
        CB = ci // bu
        bkey = np.unique(RB * np.int64(2**32) + CB)
        rb = bkey >> 32
        n_rb = -(-space.n_p2 // bu)
        counts = np.bincount(rb.astype(np.int64), minlength=n_rb)
        mem = n_rb * counts.max() * bu * bu * 4 / 1e6
        mem_csr = counts.sum() * bu * bu * 4 / 1e6
        print(f"  bu={bu:2d}: K mean {counts.mean():.1f} max {counts.max()},"
              f" ELL values {mem:.0f} MB (CSR-of-blocks {mem_csr:.0f} MB), "
              f"block occupancy "
              f"{nnz / (counts.sum() * bu * bu) * 100:.1f}%")

    from navierstokes_tpu.ops.bsr import _block_pairs
    out = {}
    for bu in (16,):
        n_rb = -(-space.n_p2 // bu)
        n_rb = -(-n_rb // 128) * 128  # row_multiple 128
        table, K, *_ = _block_pairs(rows, cols, bu, bu, n_rb)
        out[f"cols{bu}"] = table.astype(np.int32)
        print(f"  bu={bu}: ELL table ({n_rb}, {K})")
    out["n_p2"] = space.n_p2
    np.savez("/tmp/fused_graph.npz", **out)
    print("wrote /tmp/fused_graph.npz")


def bench():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    z = np.load("/tmp/fused_graph.npz")
    rng = np.random.default_rng(0)

    def timeit(name, fn, *args, n=20):
        out = jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:52s} {dt*1e3:8.3f} ms", flush=True)
        return out

    bu = 16
    cols_np = z[f"cols{bu}"]
    n_vb, K = cols_np.shape
    D = 2
    NPAD = n_vb * bu
    print(f"=== bu={bu}: n_vb={n_vb}, K={K}, values "
          f"{n_vb*K*bu*bu*4/1e6:.0f} MB ===")
    vals = jnp.asarray(
        rng.standard_normal((n_vb, K, bu, bu)).astype(np.float32))
    cols = jnp.asarray(cols_np)
    x = jnp.asarray(rng.standard_normal((NPAD, D)).astype(np.float32))
    # component-planar copies (the kernels' working layout)
    xc = jnp.asarray(np.ascontiguousarray(np.asarray(x).T))  # (D, NPAD)

    # ---- reference: current XLA broadcast-multiply-reduce ----
    def xla_mult_reduce(vals, cols, x):
        xb = x.reshape(n_vb, bu, D)
        xg = jnp.take(xb, cols, axis=0, mode="clip")
        y = (vals[..., None] * xg[:, :, None]).sum(axis=(1, 3))
        return y.reshape(-1, D)

    y_ref = timeit("XLA mult-reduce", jax.jit(xla_mult_reduce),
                   vals, cols, x)

    # row-major block values: (n_vb, bu, K*bu), minor dim 256 = 2 lanes
    vals_rm = jnp.asarray(np.ascontiguousarray(
        np.asarray(vals).transpose(0, 2, 1, 3).reshape(n_vb, bu, K * bu)))

    # ---- Pallas C: component-planar x in VMEM as (D, NPAD);
    #      per-(t,k) 16-lane slice copies; one batched matmul ----
    def kern_c(cols_ref, vals_ref, xc_ref, out_ref, xg_ref):
        T = vals_ref.shape[0]
        i = pl.program_id(0)
        for t in range(T):
            for k in range(K):
                c = cols_ref[i * T + t, k]
                xg_ref[t, :, k * bu:(k + 1) * bu] = \
                    xc_ref[:, pl.ds(c * bu, bu)]
        acc = jax.lax.dot_general(
            vals_ref[:], xg_ref[:], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # (T, bu, D)
        out_ref[:] = acc.reshape(T * bu, D)

    def make_c(T, vdt=jnp.float32):
        return pl.pallas_call(
            kern_c,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_vb // T,),
                in_specs=[
                    pl.BlockSpec((T, bu, K * bu), lambda i, c: (i, 0, 0)),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((T * bu, D), lambda i, c: (i, 0)),
                scratch_shapes=[pltpu.VMEM((T, D, K * bu), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((NPAD, D), jnp.float32),
        )

    for T in (4, 8, 16, 32):
        if n_vb % T:
            continue
        try:
            f = jax.jit(make_c(T))
            y = timeit(f"pallas C (xc slices + batched matmul) T={T}",
                       f, cols, vals_rm, xc)
            err = float(jnp.abs(y - y_ref).max())
            print(f"    max err vs XLA: {err:.2e}")
        except Exception as e:
            print(f"    C T={T} failed: {type(e).__name__}: "
                  f"{str(e)[:300]}")

    # ---- Pallas C-bf16: value stream in bf16, fp32 accumulation ----
    vals16 = vals_rm.astype(jnp.bfloat16)

    def kern_c16(cols_ref, vals_ref, xc_ref, out_ref, xg_ref):
        T = vals_ref.shape[0]
        i = pl.program_id(0)
        for t in range(T):
            for k in range(K):
                c = cols_ref[i * T + t, k]
                xg_ref[t, :, k * bu:(k + 1) * bu] = \
                    xc_ref[:, pl.ds(c * bu, bu)]
        acc = jax.lax.dot_general(
            vals_ref[:], xg_ref[:].astype(jnp.bfloat16),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[:] = acc.reshape(T * bu, D)

    def make_c16(T):
        return pl.pallas_call(
            kern_c16,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_vb // T,),
                in_specs=[
                    pl.BlockSpec((T, bu, K * bu), lambda i, c: (i, 0, 0)),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((T * bu, D), lambda i, c: (i, 0)),
                scratch_shapes=[pltpu.VMEM((T, D, K * bu), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((NPAD, D), jnp.float32),
        )

    for T in (8, 16):
        if n_vb % T:
            continue
        try:
            f = jax.jit(make_c16(T))
            timeit(f"pallas C bf16 vals T={T}", f, cols, vals16, xc)
        except Exception as e:
            print(f"    C16 T={T} failed: {type(e).__name__}: "
                  f"{str(e)[:300]}")

    # ---- transpose overhead: (N,2) <-> (2,N) in XLA ----
    f_t = jax.jit(lambda a: a.T.copy() + 0.0)
    timeit("XLA transpose (N,2)->(2,N)", f_t, x)
    f_t2 = jax.jit(lambda a: a.T.copy() + 0.0)
    timeit("XLA transpose (2,N)->(N,2)", f_t2, xc)

    # ---- batched block-Jacobi apply: (n_t, S, S) @ (n_t, S, D) ----
    print("\n=== block-Jacobi tile apply (1760 tiles of 256) ===")
    n_t, S = 1760, 256
    inv = jnp.asarray(rng.standard_normal((n_t, S, S)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((n_t * S, D)).astype(np.float32))
    rb = r.reshape(n_t, S, D)

    def xla_bj(inv, r):
        rbb = r.reshape(n_t, S, D)
        return jax.lax.dot_general(
            inv, rbb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(-1, D)

    yr = timeit("XLA batched BJ apply fp32", jax.jit(xla_bj), inv, r)

    def bj_kern(inv_ref, r_ref, out_ref):
        out_ref[:] = jax.lax.dot_general(
            inv_ref[:], r_ref[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(out_ref.shape)

    def make_bj(TB, dt):
        return pl.pallas_call(
            bj_kern,
            grid=(n_t // TB,),
            in_specs=[
                pl.BlockSpec((TB, S, S), lambda i: (i, 0, 0)),
                pl.BlockSpec((TB, S, D), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((TB * S, D), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_t * S, D), jnp.float32),
        )

    for TB in (4, 8, 16):
        try:
            f = jax.jit(make_bj(TB, jnp.float32))
            y = timeit(f"pallas BJ apply fp32 TB={TB}", f, inv, rb)
            print(f"    max err: {float(jnp.abs(y - yr).max()):.2e}")
        except Exception as e:
            print(f"    BJ TB={TB} failed: {type(e).__name__}: "
                  f"{str(e)[:200]}")

    inv16 = inv.astype(jnp.bfloat16)

    def bj_kern16(inv_ref, r_ref, out_ref):
        out_ref[:] = jax.lax.dot_general(
            inv_ref[:], r_ref[:].astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(out_ref.shape)

    def make_bj16(TB):
        return pl.pallas_call(
            bj_kern16,
            grid=(n_t // TB,),
            in_specs=[
                pl.BlockSpec((TB, S, S), lambda i: (i, 0, 0)),
                pl.BlockSpec((TB, S, D), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((TB * S, D), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_t * S, D), jnp.float32),
        )

    for TB in (8,):
        try:
            f = jax.jit(make_bj16(TB))
            timeit(f"pallas BJ apply bf16 TB={TB}", f, inv16, rb)
        except Exception as e:
            print(f"    BJ16 failed: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    {"stats": stats, "bench": bench}[sys.argv[1]]()
