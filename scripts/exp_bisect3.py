"""Bisect which E0 ingredient kills the compiler."""

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
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return False


T, bu, K, D = 8, 16, 16, 2
n_vb = 2048
NPAD = n_vb * bu
vals = jnp.ones((n_vb, bu, K * bu), jnp.float32)
xc = jnp.ones((D, NPAD), jnp.float32)
x1 = jnp.ones((NPAD,), jnp.float32)

# P6: out block (T*bu, 2) minor dim 2
def k6(in_ref, out_ref):
    out_ref[:] = jnp.sum(in_ref[:], axis=(1, 2))[:, None] \
        * jnp.ones((1, D), jnp.float32)


run("P6 out minor=2", lambda v: pl.pallas_call(
    k6,
    grid=(n_vb // T,),
    in_specs=[pl.BlockSpec((T, bu, K * bu), lambda i: (i, 0, 0))],
    out_specs=pl.BlockSpec((T, D), lambda i: (i, 0)),
    out_shape=jax.ShapeDtypeStruct((n_vb, D), jnp.float32),
)(v), vals)

# P7: full-VMEM (2, NPAD) input
def k7(xc_ref, out_ref):
    i = pl.program_id(0)
    out_ref[:] = xc_ref[:, pl.ds(i * 128, 128)]


run("P7 (2,N) full-VMEM in + dyn slice", lambda xc: pl.pallas_call(
    k7,
    grid=(NPAD // 128,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((D, 128), lambda i: (0, i)),
    out_shape=jax.ShapeDtypeStruct((D, NPAD), jnp.float32),
)(xc), xc)

# P8: (N,) 1D full-VMEM input + 16-wide dyn slice
def k8(x_ref, out_ref):
    i = pl.program_id(0)
    out_ref[:] = x_ref[pl.ds(i * 16, 16)]


run("P8 1D 16-wide dyn slice", lambda x: pl.pallas_call(
    k8,
    grid=(NPAD // 16,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((16,), lambda i: (i,)),
    out_shape=jax.ShapeDtypeStruct((NPAD,), jnp.float32),
)(x), x1)

# P9: 3D scratch with mixed-index write (2,16) piece
def k9(xc_ref, out_ref, xg_ref):
    i = pl.program_id(0)
    xg_ref[0, :, 0:bu] = xc_ref[:, pl.ds(i * bu, bu)]
    out_ref[:] = xg_ref[0]


run("P9 3D scratch mixed write", lambda xc: pl.pallas_call(
    k9,
    grid=(4,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((D, K * bu), lambda i: (0, 0)),
    out_shape=jax.ShapeDtypeStruct((D, K * bu), jnp.float32),
    scratch_shapes=[pltpu.VMEM((T, D, K * bu), jnp.float32)],
)(xc), xc)

# P10: prefetch + 3D in block together
cols = jnp.zeros((n_vb, K), jnp.int32)


def k10(c_ref, v_ref, out_ref):
    i = pl.program_id(0)
    out_ref[:] = jnp.sum(v_ref[:], axis=(1, 2))[:, None] \
        * (1.0 + c_ref[i * T, 0].astype(jnp.float32)) \
        * jnp.ones((1, D), jnp.float32)


run("P10 prefetch + 3D block", lambda c, v: pl.pallas_call(
    k10,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_vb // T,),
        in_specs=[pl.BlockSpec((T, bu, K * bu), lambda i, c: (i, 0, 0))],
        out_specs=pl.BlockSpec((T, D), lambda i, c: (i, 0)),
    ),
    out_shape=jax.ShapeDtypeStruct((n_vb, D), jnp.float32),
)(c, v), cols, vals)
