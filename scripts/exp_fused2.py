"""Full-scale (1M-DoF) on-chip measurement of the fused F-matvec kernel
candidates and the planar block-Jacobi kernel.

Needs /tmp/fused_graph.npz from `exp_fused.py stats` (real bu=16 cols).

Validated Mosaic constraints on this toolchain (scripts/exp_bisect*):
  * dynamic LANE slices must be 128-wide and 128-aligned (16-wide crash)
  * dynamic SUBLANE slices fine; static 16-wide lane slices fine
  * pltpu.roll with traced shift fine
  * blocked SMEM inputs fine; big scalar-prefetch arrays crash (SMEM size)
  * block shapes: last two dims divisible by (8,128) or == array dims
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

z = np.load("/tmp/fused_graph.npz")
cols_np = z["cols16"]
n_vb, K = cols_np.shape
bu, D = 16, 2
C = K * bu
NPAD = n_vb * bu
T = 8  # block rows per tile; T*bu = 128 = output row
rng = np.random.default_rng(0)

print(f"n_vb={n_vb} K={K} values {n_vb*bu*C*4/1e6:.0f} MB")

cols = jnp.asarray(cols_np)
vals_np = rng.standard_normal((n_vb, bu, C)).astype(np.float32)
vals = jnp.asarray(vals_np)
x_np = rng.standard_normal((NPAD, D)).astype(np.float32)
x = jnp.asarray(x_np)
xx = jnp.asarray(np.ascontiguousarray(x_np[:, 0]).reshape(-1, 128))
xy = jnp.asarray(np.ascontiguousarray(x_np[:, 1]).reshape(-1, 128))
xint = jnp.asarray(x_np.reshape(-1, 128))          # interleaved pairs


def timeit(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:54s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms",
          flush=True)
    return out


# ---- XLA reference ----
def xla_mult_reduce(vals4, cols, x):
    xb = x.reshape(n_vb, bu, D)
    xg = jnp.take(xb, cols, axis=0, mode="clip")
    y = (vals4[..., None] * xg[:, :, None]).sum(axis=(1, 3))
    return y.reshape(-1, D)


vals4 = jnp.asarray(
    vals_np.reshape(n_vb, bu, K, bu).transpose(0, 2, 1, 3).copy())
y_ref = timeit("XLA mult-reduce", jax.jit(xla_mult_reduce),
               vals4, cols, x)
ref_x = np.asarray(y_ref)[:, 0].reshape(-1, 1, 128)
ref_y = np.asarray(y_ref)[:, 1].reshape(-1, 1, 128)


def check(name, outx, outy):
    ex = np.abs(np.asarray(outx) - ref_x).max()
    ey = np.abs(np.asarray(outy) - ref_y).max()
    print(f"    {name} err: {ex:.2e} {ey:.2e}")


# ---- variant A: separated components, roll gather ----
def kern_a(cols_ref, vals_ref, xx_ref, xy_ref, outx_ref, outy_ref,
           xgx_ref, xgy_ref):
    for t in range(T):
        for k in range(K):
            c = cols_ref[t, k]
            r = c // 8
            ph = (c % 8) * bu
            wx = xx_ref[pl.ds(r, 1), :]
            wy = xy_ref[pl.ds(r, 1), :]
            rx = pltpu.roll(wx, -ph, 1)
            ry = pltpu.roll(wy, -ph, 1)
            xgx_ref[t, k * bu:(k + 1) * bu] = rx[0, 0:bu]
            xgy_ref[t, k * bu:(k + 1) * bu] = ry[0, 0:bu]
    accx = jax.lax.dot_general(
        vals_ref[:], xgx_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    accy = jax.lax.dot_general(
        vals_ref[:], xgy_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    outx_ref[:] = accx.reshape(1, 1, T * bu)
    outy_ref[:] = accy.reshape(1, 1, T * bu)


def make_a(vdtype=jnp.float32):
    return pl.pallas_call(
        kern_a,
        grid=(n_vb // T,),
        in_specs=[
            pl.BlockSpec((T, K), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T, bu, C), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, T * bu), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, T * bu), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_vb // T, 1, T * bu), jnp.float32),
            jax.ShapeDtypeStruct((n_vb // T, 1, T * bu), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((T, C), jnp.float32),
                        pltpu.VMEM((T, C), jnp.float32)],
    )


try:
    f = jax.jit(lambda c, v, a, b: make_a()(c, v, a, b))
    oa = timeit("pallas A roll-gather sep-comp fp32", f, cols, vals, xx, xy)
    check("A", *oa)
except Exception as e:
    print(f"A failed: {type(e).__name__}: {str(e)[:200]}")

# ---- variant A bf16 values ----
vals16 = vals.astype(jnp.bfloat16)


def kern_a16(cols_ref, vals_ref, xx_ref, xy_ref, outx_ref, outy_ref,
             xgx_ref, xgy_ref):
    for t in range(T):
        for k in range(K):
            c = cols_ref[t, k]
            r = c // 8
            ph = (c % 8) * bu
            wx = xx_ref[pl.ds(r, 1), :]
            wy = xy_ref[pl.ds(r, 1), :]
            rx = pltpu.roll(wx, -ph, 1)
            ry = pltpu.roll(wy, -ph, 1)
            xgx_ref[t, k * bu:(k + 1) * bu] = rx[0, 0:bu]
            xgy_ref[t, k * bu:(k + 1) * bu] = ry[0, 0:bu]
    accx = jax.lax.dot_general(
        vals_ref[:], xgx_ref[:].astype(jnp.bfloat16),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    accy = jax.lax.dot_general(
        vals_ref[:], xgy_ref[:].astype(jnp.bfloat16),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    outx_ref[:] = accx.reshape(1, 1, T * bu)
    outy_ref[:] = accy.reshape(1, 1, T * bu)


def make_a16():
    return pl.pallas_call(
        kern_a16,
        grid=(n_vb // T,),
        in_specs=[
            pl.BlockSpec((T, K), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T, bu, C), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, T * bu), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, T * bu), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_vb // T, 1, T * bu), jnp.float32),
            jax.ShapeDtypeStruct((n_vb // T, 1, T * bu), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((T, C), jnp.float32),
                        pltpu.VMEM((T, C), jnp.float32)],
    )


try:
    f = jax.jit(lambda c, v, a, b: make_a16()(c, v, a, b))
    timeit("pallas A roll-gather sep-comp bf16", f, cols, vals16, xx, xy)
except Exception as e:
    print(f"A16 failed: {type(e).__name__}: {str(e)[:200]}")


# ---- variant B: interleaved x, 1 load+roll+store per pair ----
def kern_b(cols_ref, vals_ref, xi_ref, outx_ref, outy_ref, xgi_ref):
    for t in range(T):
        for k in range(K):
            c = cols_ref[t, k]
            r = c // 4
            ph = (c % 4) * 32
            w = xi_ref[pl.ds(r, 1), :]
            rw = pltpu.roll(w, -ph, 1)
            xgi_ref[t, k * 32:(k + 1) * 32] = rw[0, 0:32]
    xgi = xgi_ref[:].reshape(T, C, 2)
    accx = jax.lax.dot_general(
        vals_ref[:], xgi[:, :, 0], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    accy = jax.lax.dot_general(
        vals_ref[:], xgi[:, :, 1], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    outx_ref[:] = accx.reshape(1, 1, T * bu)
    outy_ref[:] = accy.reshape(1, 1, T * bu)


def make_b():
    return pl.pallas_call(
        kern_b,
        grid=(n_vb // T,),
        in_specs=[
            pl.BlockSpec((T, K), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T, bu, C), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, T * bu), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, T * bu), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_vb // T, 1, T * bu), jnp.float32),
            jax.ShapeDtypeStruct((n_vb // T, 1, T * bu), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((T, 2 * C), jnp.float32)],
    )


try:
    f = jax.jit(lambda c, v, xi: make_b()(c, v, xi))
    ob = timeit("pallas B roll-gather interleaved fp32", f, cols, vals,
                xint)
    check("B", *ob)
except Exception as e:
    print(f"B failed: {type(e).__name__}: {str(e)[:200]}")


# ---- planar block-Jacobi apply ----
print("\n=== block-Jacobi (1760 x 256 x 256) ===")
n_t, S = 1760, 256
inv_np = rng.standard_normal((n_t, S, S)).astype(np.float32)
inv = jnp.asarray(inv_np)
r_np = rng.standard_normal((n_t, D, S)).astype(np.float32)
rp = jnp.asarray(r_np)


def xla_bj_planar(inv, rp):
    return jax.lax.dot_general(
        rp, inv, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


y_bjref = timeit("XLA BJ planar A@B^T", jax.jit(xla_bj_planar), inv, rp)


def bj_kern(inv_ref, r_ref, out_ref):
    out_ref[:] = jax.lax.dot_general(
        r_ref[:], inv_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def make_bj(TB, idt):
    return pl.pallas_call(
        bj_kern,
        grid=(n_t // TB,),
        in_specs=[
            pl.BlockSpec((TB, S, S), lambda i: (i, 0, 0)),
            pl.BlockSpec((TB, D, S), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TB, D, S), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_t, D, S), jnp.float32),
    )


for TB in (4, 8, 16):
    try:
        f = jax.jit(lambda i, r: make_bj(TB, jnp.float32)(i, r))
        y = timeit(f"pallas BJ planar fp32 TB={TB}", f, inv, rp)
        print(f"    err {float(jnp.abs(y - y_bjref).max()):.2e}")
    except Exception as e:
        print(f"BJ TB={TB} failed: {type(e).__name__}: {str(e)[:150]}")

inv16 = inv.astype(jnp.bfloat16)


def bj_kern16(inv_ref, r_ref, out_ref):
    out_ref[:] = jax.lax.dot_general(
        r_ref[:].astype(jnp.bfloat16), inv_ref[:],
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def make_bj16(TB):
    return pl.pallas_call(
        bj_kern16,
        grid=(n_t // TB,),
        in_specs=[
            pl.BlockSpec((TB, S, S), lambda i: (i, 0, 0)),
            pl.BlockSpec((TB, D, S), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TB, D, S), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_t, D, S), jnp.float32),
    )


for TB in (8,):
    try:
        f = jax.jit(lambda i, r: make_bj16(TB)(i, r))
        timeit(f"pallas BJ planar bf16 TB={TB}", f, inv16, rp)
    except Exception as e:
        print(f"BJ16 failed: {type(e).__name__}: {str(e)[:150]}")
