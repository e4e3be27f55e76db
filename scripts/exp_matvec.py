"""On-chip microbenchmarks for candidate SpMV formulations and assembly
primitives at bench scale.  All data passed as jit arguments (no baked
constants)."""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_VB, K, BU, D = 28158, 16, 16, 2
N_P2 = N_VB * BU


def timeit(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.standard_normal((N_VB, K, BU, BU)), jnp.float32)
    # plausible hilbert-ish cols: diagonal +- small
    cols_np = (np.arange(N_VB)[:, None]
               + rng.integers(-6, 7, (N_VB, K))).clip(0, N_VB - 1)
    cols = jnp.asarray(cols_np, jnp.int32)
    x = jnp.asarray(rng.standard_normal((N_P2, D)), jnp.float32)

    @jax.jit
    def mv_einsum(vals, cols, x):
        xb = x.reshape(N_VB, BU, D)
        xg = jnp.take(xb, cols, axis=0)
        return jnp.einsum("nkab,nkbd->nad", vals, xg).reshape(N_P2, D)

    @jax.jit
    def mv_reduce(vals, cols, x):
        xb = x.reshape(N_VB, BU, D)
        xg = jnp.take(xb, cols, axis=0)              # (n, K, bu, d)
        prod = vals[..., None] * xg[:, :, None, :, :]  # (n,K,a,b,d)
        return prod.sum(axis=(1, 3)).reshape(N_P2, D)

    @jax.jit
    def mv_matmul(vals, cols, x):
        xb = x.reshape(N_VB, BU, D)
        xg = jnp.take(xb, cols, axis=0).reshape(N_VB, K * BU, D)
        v2 = vals.transpose(0, 2, 1, 3).reshape(N_VB, BU, K * BU)
        return jnp.matmul(v2, xg).reshape(N_P2, D)

    @jax.jit
    def mv_reduce_bf16(vals16, cols, x):
        xb = x.reshape(N_VB, BU, D)
        xg = jnp.take(xb, cols, axis=0).astype(jnp.bfloat16)
        prod = vals16[..., None] * xg[:, :, None, :, :]
        return prod.astype(jnp.float32).sum(axis=(1, 3)).reshape(N_P2, D)

    @jax.jit
    def gather_only(cols, x):
        xb = x.reshape(N_VB, BU, D)
        return jnp.take(xb, cols, axis=0)

    @jax.jit
    def read_only(vals):
        return vals.sum(axis=(1, 3))

    # correctness cross-check
    a = mv_einsum(vals, cols, x)
    b = mv_reduce(vals, cols, x)
    c = mv_matmul(vals, cols, x)
    print("max diff reduce vs einsum:", float(jnp.abs(a - b).max()))
    print("max diff matmul vs einsum:", float(jnp.abs(a - c).max()))

    timeit("einsum (current)", mv_einsum, vals, cols, x)
    timeit("mult-reduce", mv_reduce, vals, cols, x)
    timeit("batched matmul (16,K*16)@(K*16,2)", mv_matmul, vals, cols, x)
    v16 = vals.astype(jnp.bfloat16)
    timeit("mult-reduce bf16 vals", mv_reduce_bf16, v16, cols, x)
    timeit("gather only", gather_only, cols, x)
    timeit("stream vals only (sum)", read_only, vals)

    # ---- assembly primitives ----
    NC = 223762
    NV = 36
    n_slots = N_VB * K * BU * BU
    ev = jnp.asarray(rng.standard_normal(NC * NV), jnp.float32)
    # sorted slot targets
    tgt = np.sort(rng.integers(0, n_slots, NC * NV)).astype(np.int32)
    seg = jnp.asarray(tgt)
    perm = jnp.asarray(rng.permutation(NC * NV).astype(np.int32))

    @jax.jit
    def segsum(ev, seg):
        return jax.ops.segment_sum(ev, seg, num_segments=n_slots,
                                   indices_are_sorted=True)

    @jax.jit
    def scatter_add(ev, seg):
        return jnp.zeros(n_slots, jnp.float32).at[seg].add(
            ev, indices_are_sorted=True, unique_indices=False)

    @jax.jit
    def take_scalar(ev, perm):
        return jnp.take(ev, perm)

    @jax.jit
    def cumsum8m(ev):
        return jnp.cumsum(ev)

    timeit("segment_sum 8M->115M sorted", segsum, ev, seg, n=5)
    timeit("scatter-add 8M->115M sorted", scatter_add, ev, seg, n=5)
    timeit("take 8M scalar rows (sort perm)", take_scalar, ev, perm, n=5)
    timeit("cumsum 8M", cumsum8m, ev, n=5)


if __name__ == "__main__":
    main()
