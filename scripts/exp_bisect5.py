"""Isolate the exact crashing construct."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn, *args):
    try:
        out = jax.block_until_ready(jax.jit(fn)(*args))
        print(f"OK   {name}", flush=True)
        return out
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:130]}",
              flush=True)
        return None


T, bu, K, D = 8, 16, 16, 2
C = K * bu
n_vb = 256
NPAD = n_vb * bu
cols = jnp.zeros((n_vb, K), jnp.int32)
vals = jnp.ones((n_vb, bu, C), jnp.float32)
xc = jnp.ones((D, NPAD), jnp.float32)

# Q1: blocked SMEM in_spec, scalar read only
def kq1(c_ref, v_ref, out_ref):
    out_ref[:] = v_ref[:] + c_ref[0, 0].astype(jnp.float32)


run("Q1 blocked SMEM input", lambda c, v: pl.pallas_call(
    kq1,
    grid=(n_vb // T,),
    in_specs=[
        pl.BlockSpec((T, K), lambda i: (i, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((T, bu, C), lambda i: (i, 0, 0)),
    ],
    out_specs=pl.BlockSpec((T, bu, C), lambda i: (i, 0, 0)),
    out_shape=jax.ShapeDtypeStruct((n_vb, bu, C), jnp.float32),
)(c, v), cols, vals)

# Q2a: 128-wide dynamic lane slice copy into 2D scratch
def kq2a(xc_ref, out_ref, xg_ref):
    i = pl.program_id(0)
    xg_ref[0, 0:128] = xc_ref[0, pl.ds(i * 128, 128)]
    out_ref[:] = xg_ref[:] * 1.0


run("Q2a 128-wide dyn lane slice -> scratch", lambda x: pl.pallas_call(
    kq2a,
    grid=(4,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((T, C), lambda i: (0, 0)),
    out_shape=jax.ShapeDtypeStruct((T, C), jnp.float32),
    scratch_shapes=[pltpu.VMEM((T, C), jnp.float32)],
)(x), xc)

# Q2b: 16-wide dynamic lane slice copy into 2D scratch
def kq2b(xc_ref, out_ref, xg_ref):
    i = pl.program_id(0)
    xg_ref[0, 0:16] = xc_ref[0, pl.ds(i * 16, 16)]
    out_ref[:] = xg_ref[:] * 1.0


run("Q2b 16-wide dyn lane slice -> scratch", lambda x: pl.pallas_call(
    kq2b,
    grid=(4,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((T, C), lambda i: (0, 0)),
    out_shape=jax.ShapeDtypeStruct((T, C), jnp.float32),
    scratch_shapes=[pltpu.VMEM((T, C), jnp.float32)],
)(x), xc)

# Q2c: 16-wide STATIC lane slice copy
def kq2c(xc_ref, out_ref, xg_ref):
    xg_ref[0, 0:16] = xc_ref[0, 32:48]
    out_ref[:] = xg_ref[:] * 1.0


run("Q2c 16-wide static lane slice -> scratch", lambda x: pl.pallas_call(
    kq2c,
    grid=(4,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((T, C), lambda i: (0, 0)),
    out_shape=jax.ShapeDtypeStruct((T, C), jnp.float32),
    scratch_shapes=[pltpu.VMEM((T, C), jnp.float32)],
)(x), xc)

# Q3: reshape (T,bu) -> (1,1,128) write
def kq3(v_ref, out_ref):
    acc = jnp.sum(v_ref[:], axis=2)        # (T, bu)
    out_ref[:] = acc.reshape(1, 1, T * bu)


run("Q3 reshape (8,16)->(1,1,128)", lambda v: pl.pallas_call(
    kq3,
    grid=(n_vb // T,),
    in_specs=[pl.BlockSpec((T, bu, C), lambda i: (i, 0, 0))],
    out_specs=pl.BlockSpec((1, 1, T * bu), lambda i: (i, 0, 0)),
    out_shape=jax.ShapeDtypeStruct((n_vb // T, 1, T * bu), jnp.float32),
)(v), vals)

# Q4: batched matvec dot_general rank-2 rhs
xg = jnp.ones((T, C), jnp.float32)


def kq4(v_ref, g_ref, out_ref):
    acc = jax.lax.dot_general(
        v_ref[:], g_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)    # (T, bu)
    out_ref[:] = acc


run("Q4 batched matvec", lambda v, g: pl.pallas_call(
    kq4,
    out_shape=jax.ShapeDtypeStruct((T, bu), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(v[:T], g), vals, xg)

# Q5: scalar read from blocked SMEM used as dynamic slice index
def kq5(c_ref, xc_ref, out_ref, xg_ref):
    c = c_ref[0, 0]
    xg_ref[0, 0:16] = xc_ref[0, pl.ds(c * bu, bu)]
    out_ref[:] = xg_ref[:] * 1.0


run("Q5 SMEM scalar as slice index", lambda c, x: pl.pallas_call(
    kq5,
    grid=(n_vb // T,),
    in_specs=[
        pl.BlockSpec((T, K), lambda i: (i, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((T, C), lambda i: (0, 0)),
    out_shape=jax.ShapeDtypeStruct((T, C), jnp.float32),
    scratch_shapes=[pltpu.VMEM((T, C), jnp.float32)],
)(c, x), cols, xc)
