"""Pallas SpMV prototypes at bench scale: measure dynamic-slice cost and
band-formulation speed to pick the production kernel design."""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_VB, K, BU, D = 28160, 16, 16, 2
N_P2 = N_VB * BU
W = 4  # band half-width in blocks


def timeit(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms", flush=True)


# ---------------- ELL16 kernel: x in VMEM, per-(t,k) dynamic slices -------
def ell_kernel(cols_ref, vals_ref, x_ref, out_ref):
    # vals_ref: (T, K, BU, BU); cols_ref: (T, K) int32 (SMEM via prefetch)
    T = vals_ref.shape[0]
    i = pl.program_id(0)
    acc = jnp.zeros((T * BU, D), jnp.float32)
    for t in range(T):
        a = jnp.zeros((BU, D), jnp.float32)
        for k in range(K):
            c = cols_ref[i * T + t, k]
            xk = x_ref[pl.ds(c * BU, BU), :]          # (BU, D)
            a += jax.lax.dot_general(
                vals_ref[t, k], xk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc = jax.lax.dynamic_update_slice(acc, a, (t * BU, 0))
    out_ref[:] = acc


def make_ell(T=8):
    grid = N_VB // T
    return pl.pallas_call(
        ell_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((T, K, BU, BU), lambda i, cols: (i, 0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T * BU, D), lambda i, cols: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((N_P2, D), jnp.float32),
    )


# ---------------- band kernel: no dynamic cols ----------------------------
def band_kernel(vals_ref, x_ref, out_ref):
    # vals_ref: (T, 2W+1, BU, BU) fp32; x_ref: whole (N_P2, D) VMEM
    T = vals_ref.shape[0]
    i = pl.program_id(0)
    base = i * T * BU
    nb = 2 * W + 1
    # gather the local window once: rows [base - W*BU, base + (T+W)*BU)
    acc = jnp.zeros((T * BU, D), jnp.float32)
    for w in range(nb):
        off = base + (w - W) * BU
        off = jnp.clip(off, 0, N_P2 - T * BU)
        xw = x_ref[pl.ds(off, T * BU), :]             # (T*BU, D)
        # per row-block matmul: vals (T,BU,BU) @ xw blocks (T,BU,D)
        a = vals_ref[:, w]                            # (T, BU, BU)
        xb = xw.reshape(T, BU, D)
        acc += jax.lax.dot_general(
            a, xb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).reshape(T * BU, D)
    out_ref[:] = acc


def make_band(T=64, dtype=jnp.float32):
    grid = N_VB // T
    nb = 2 * W + 1
    return pl.pallas_call(
        band_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((T, nb, BU, BU), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T * BU, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N_P2, D), jnp.float32),
    )


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N_P2, D)), jnp.float32)

    # band reference check + timing
    for T in (32, 64):
        vals_b = jnp.asarray(
            rng.standard_normal((N_VB, 2 * W + 1, BU, BU)), jnp.float32)
        f = jax.jit(make_band(T))
        try:
            timeit(f"pallas band W={W} T={T} fp32", f, vals_b, x)
        except Exception as e:
            print(f"band T={T} failed: {type(e).__name__}: {e}")
            break

    # correctness of band vs numpy for small case
    f = jax.jit(make_band(64))
    vals_b = jnp.asarray(
        rng.standard_normal((N_VB, 2 * W + 1, BU, BU)), jnp.float32)
    y = np.asarray(f(vals_b, x))
    # reference: y[n] = sum_w vals[n,w] @ x[clipped window]
    xb = np.asarray(x).reshape(N_VB, BU, D)
    vb = np.asarray(vals_b)
    n_check = 50
    ok = True
    for n in list(range(3)) + list(rng.integers(5, N_VB - 5, n_check)):
        acc = np.zeros((BU, D))
        i = n // 64
        base = i * 64 * BU
        for w in range(2 * W + 1):
            off = base + (w - W) * BU
            off = min(max(off, 0), N_P2 - 64 * BU)
            t = n - i * 64
            xw = np.asarray(x)[off + t * BU: off + (t + 1) * BU]
            acc += vb[n, w] @ xw
        if not np.allclose(acc, y[n * BU:(n + 1) * BU], atol=1e-3):
            ok = False
            print(f"band mismatch at block {n}")
            break
    print("band correctness:", ok)

    # ELL16 kernel
    cols_np = (np.arange(N_VB)[:, None]
               + rng.integers(-6, 7, (N_VB, K))).clip(0, N_VB - 1)
    cols = jnp.asarray(cols_np, jnp.int32)
    vals = jnp.asarray(rng.standard_normal((N_VB, K, BU, BU)), jnp.float32)
    for T in (8, 32):
        try:
            f = jax.jit(make_ell(T))
            timeit(f"pallas ell16 T={T} fp32", f, cols, vals, x)
        except Exception as e:
            print(f"ell T={T} failed: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
