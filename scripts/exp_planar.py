"""Planar (lane-major) BSR matvec prototype vs the current mult-reduce.

Hypothesis (from measured VPU lane math): the current apply_f computes
(n_vb, K, bu, bu) x (n_vb, K, bu, d) with the d=2 axis minor -> 2/128
lane utilization on the VPU; at 1M DoF that is ~7 ms for 461 MB of value
traffic (66 GB/s effective vs ~820 GB/s HBM).  Relayout the values as
(n_t, K, bu, bu, 128) with a 128-block-row tile batch on the minor axis
and transpose the gathered operand to match -> every elementwise op runs
full-lane; expected ~6-9x.

Run on the TPU: python scripts/exp_planar.py [--n_vb N] [--K K]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, n=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:40s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_vb", type=int, default=28160)  # 1M-DoF scale
    ap.add_argument("--K", type=int, default=16)
    ap.add_argument("--bu", type=int, default=16)
    ap.add_argument("--d", type=int, default=2)
    args = ap.parse_args()
    n_vb, K, bu, d = args.n_vb, args.K, args.bu, args.d
    T = 128
    n_t = n_vb // T
    rng = np.random.default_rng(0)

    # synthetic Hilbert-like cols: mostly near-diagonal
    cols = (np.arange(n_vb)[:, None]
            + rng.integers(-8, 9, size=(n_vb, K))).clip(0, n_vb - 1)
    cols = cols.astype(np.int32)
    vals = rng.standard_normal((n_vb, K, bu, bu)).astype(np.float32)
    x = rng.standard_normal((n_vb * bu, d)).astype(np.float32)

    vals_j = jnp.asarray(vals)
    cols_j = jnp.asarray(cols)
    x_j = jnp.asarray(x)
    # planar value layout: (n_t, K, bu_a, bu_b, T)
    vals_p = jnp.asarray(
        vals.reshape(n_t, T, K, bu, bu).transpose(0, 2, 3, 4, 1).copy())

    @jax.jit
    def mult_reduce(vals, cols, x):
        xb = x.reshape(n_vb, bu, d)
        xg = jnp.take(xb, cols, axis=0)                 # (n_vb, K, bu, d)
        y = (vals[..., None] * xg[:, :, None]).sum(axis=(1, 3))
        return y.reshape(n_vb * bu, d)

    @jax.jit
    def planar(vals_p, cols, x):
        xb = x.reshape(n_vb, bu, d)
        xg = jnp.take(xb, cols, axis=0)                 # (n_vb, K, bu, d)
        xg = xg.reshape(n_t, T, K, bu, d).transpose(0, 2, 3, 4, 1)
        # y[t, a, dd, l] = sum_{k, b} vals_p[t,k,a,b,l] * xg[t,k,b,dd,l]
        y = jnp.einsum("tkabl,tkbdl->tadl", vals_p, xg)
        return y.transpose(0, 3, 1, 2).reshape(n_vb * bu, d)

    @jax.jit
    def planar_mr(vals_p, cols, x):
        xb = x.reshape(n_vb, bu, d)
        xg = jnp.take(xb, cols, axis=0)
        xg = xg.reshape(n_t, T, K, bu, d).transpose(0, 2, 3, 4, 1)
        prod = vals_p[:, :, :, :, None, :] * xg[:, :, None, :, :, :]
        y = prod.sum(axis=(1, 3))                       # (n_t, bu, d, T)
        return y.transpose(0, 3, 1, 2).reshape(n_vb * bu, d)

    y0 = mult_reduce(vals_j, cols_j, x_j)
    y1 = planar(vals_p, cols_j, x_j)
    y2 = planar_mr(vals_p, cols_j, x_j)
    print("planar err:", float(jnp.abs(y1 - y0).max()),
          float(jnp.abs(y2 - y0).max()))

    gb = vals.nbytes / 1e9
    t0 = timeit("mult_reduce (current)", mult_reduce, vals_j, cols_j, x_j)
    t1 = timeit("planar einsum", planar, vals_p, cols_j, x_j)
    t2 = timeit("planar mult-reduce", planar_mr, vals_p, cols_j, x_j)
    for name, t in (("current", t0), ("planar", t1), ("planar_mr", t2)):
        print(f"{name:12s} {gb / (t / 1e3):7.1f} GB/s effective")


if __name__ == "__main__":
    main()
