"""Bisect the kern_a crash: width-1 sublane ds, SMEM-derived roll, unroll."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn, *args):
    try:
        jax.block_until_ready(jax.jit(fn)(*args))
        print(f"OK   {name}", flush=True)
        return True
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:110]}",
              flush=True)
        return False


T, bu, K = 8, 16, 16
C = K * bu
xx = jnp.asarray(np.arange(4096, dtype=np.float32).reshape(-1, 128))
cols = jnp.ones((256, K), jnp.int32)

# W1: width-1 dynamic sublane slice
def kw1(x_ref, out_ref):
    i = pl.program_id(0)
    out_ref[:] = x_ref[pl.ds(i * 2 + 1, 1), :] * 1.0


run("W1 width-1 dyn sublane", lambda x: pl.pallas_call(
    kw1,
    grid=(4,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, 128), lambda i: (i, 0)),
    out_shape=jax.ShapeDtypeStruct((4, 128), jnp.float32),
)(x), xx)

# W2: roll with SMEM-scalar-derived shift
def kw2(c_ref, x_ref, out_ref):
    c = c_ref[0, 0]
    ph = (c % 8) * bu
    w = x_ref[0:1, :]
    out_ref[:] = pltpu.roll(w, -ph, 1)


run("W2 roll by SMEM scalar", lambda c, x: pl.pallas_call(
    kw2,
    grid=(4,),
    in_specs=[
        pl.BlockSpec((T, K), lambda i: (i, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((1, 128), lambda i: (i, 0)),
    out_shape=jax.ShapeDtypeStruct((4, 128), jnp.float32),
)(c, x), cols, xx)

# W3: combined single iteration of kern_a body
def kw3(c_ref, x_ref, out_ref, xg_ref):
    c = c_ref[0, 0]
    r = c // 8
    ph = (c % 8) * bu
    w = x_ref[pl.ds(r, 1), :]
    rw = pltpu.roll(w, -ph, 1)
    xg_ref[0, 0:bu] = rw[0, 0:bu]
    out_ref[:] = xg_ref[:] * 1.0


run("W3 one gather iteration", lambda c, x: pl.pallas_call(
    kw3,
    grid=(4,),
    in_specs=[
        pl.BlockSpec((T, K), lambda i: (i, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((T, C), lambda i: (0, 0)),
    out_shape=jax.ShapeDtypeStruct((T, C), jnp.float32),
    scratch_shapes=[pltpu.VMEM((T, C), jnp.float32)],
)(c, x), cols, xx)

# W4: 16 gather iterations (one t row)
def kw4(c_ref, x_ref, out_ref, xg_ref):
    for k in range(K):
        c = c_ref[0, k]
        r = c // 8
        ph = (c % 8) * bu
        w = x_ref[pl.ds(r, 1), :]
        rw = pltpu.roll(w, -ph, 1)
        xg_ref[0, k * bu:(k + 1) * bu] = rw[0, 0:bu]
    out_ref[:] = xg_ref[:] * 1.0


run("W4 16 gather iterations", lambda c, x: pl.pallas_call(
    kw4,
    grid=(4,),
    in_specs=[
        pl.BlockSpec((T, K), lambda i: (i, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((T, C), lambda i: (0, 0)),
    out_shape=jax.ShapeDtypeStruct((T, C), jnp.float32),
    scratch_shapes=[pltpu.VMEM((T, C), jnp.float32)],
)(c, x), cols, xx)

# W5: full 128 iterations
def kw5(c_ref, x_ref, out_ref, xg_ref):
    for t in range(T):
        for k in range(K):
            c = c_ref[t, k]
            r = c // 8
            ph = (c % 8) * bu
            w = x_ref[pl.ds(r, 1), :]
            rw = pltpu.roll(w, -ph, 1)
            xg_ref[t, k * bu:(k + 1) * bu] = rw[0, 0:bu]
    out_ref[:] = xg_ref[:] * 1.0


run("W5 128 gather iterations", lambda c, x: pl.pallas_call(
    kw5,
    grid=(4,),
    in_specs=[
        pl.BlockSpec((T, K), lambda i: (i, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((T, C), lambda i: (0, 0)),
    out_shape=jax.ShapeDtypeStruct((T, C), jnp.float32),
    scratch_shapes=[pltpu.VMEM((T, C), jnp.float32)],
)(c, x), cols, xx)


# W6: full kern_a at small scale
n_vb = 256
NPAD = n_vb * bu
vals = jnp.ones((n_vb, bu, C), jnp.float32)
xx2 = jnp.asarray(np.arange(NPAD, dtype=np.float32).reshape(-1, 128))
xy2 = xx2 + 0.5
cols2 = jnp.asarray(
    (np.arange(n_vb)[:, None] + np.arange(K)[None, :]).clip(0, n_vb - 1)
    .astype(np.int32))


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


run("W6 full kern_a small", lambda c, v, a, b: pl.pallas_call(
    kern_a,
    grid=(n_vb // T,),
    in_specs=[
        pl.BlockSpec((T, K), lambda i: (i, 0), memory_space=pltpu.SMEM),
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
)(c, v, a, b), cols2, vals, xx2, xy2)


# W7: W6 without the matvecs (outputs from scratch sums)
def kern_a7(cols_ref, vals_ref, xx_ref, xy_ref, outx_ref, outy_ref,
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
    outx_ref[:] = jnp.sum(
        xgx_ref[:].reshape(T, K, bu), axis=1).reshape(1, 1, T * bu)
    outy_ref[:] = jnp.sum(
        xgy_ref[:].reshape(T, K, bu), axis=1).reshape(1, 1, T * bu)


run("W7 gather+sum no matvec", lambda c, v, a, b: pl.pallas_call(
    kern_a7,
    grid=(n_vb // T,),
    in_specs=[
        pl.BlockSpec((T, K), lambda i: (i, 0), memory_space=pltpu.SMEM),
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
)(c, v, a, b), cols2, vals, xx2, xy2)
