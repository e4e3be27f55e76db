"""Is Pallas usable at all over the axon tunnel?"""

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
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


x = jnp.ones((256, 256), jnp.float32)

# P0: minimal kernel, no grid
def k0(in_ref, out_ref):
    out_ref[:] = in_ref[:] * 2.0


run("P0 minimal", lambda x: pl.pallas_call(
    k0,
    out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x), x)

# P1: gridded
run("P1 gridded", lambda x: pl.pallas_call(
    k0,
    grid=(2,),
    in_specs=[pl.BlockSpec((128, 256), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((128, 256), lambda i: (i, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
)(x), x)

# P2: gridded + scratch
def k2(in_ref, out_ref, s_ref):
    s_ref[:] = in_ref[:]
    out_ref[:] = s_ref[:] * 2.0


run("P2 scratch", lambda x: pl.pallas_call(
    k2,
    grid=(2,),
    in_specs=[pl.BlockSpec((128, 256), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((128, 256), lambda i: (i, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    scratch_shapes=[pltpu.VMEM((128, 256), jnp.float32)],
)(x), x)

# P3: scalar prefetch
cols = jnp.zeros((4,), jnp.int32)


def k3(c_ref, in_ref, out_ref):
    out_ref[:] = in_ref[:] + c_ref[0].astype(jnp.float32)


run("P3 prefetch", lambda c, x: pl.pallas_call(
    k3,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(2,),
        in_specs=[pl.BlockSpec((128, 256), lambda i, c: (i, 0))],
        out_specs=pl.BlockSpec((128, 256), lambda i, c: (i, 0)),
    ),
    out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
)(c, x), cols, x)

# P4: dynamic slice from full-VMEM operand
def k4(in_ref, out_ref):
    i = pl.program_id(0)
    out_ref[:] = in_ref[pl.ds(i * 128, 128), :] * 2.0


run("P4 dynamic slice", lambda x: pl.pallas_call(
    k4,
    grid=(2,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((128, 256), lambda i: (i, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
)(x), x)

# P5: batched A@B^T dot_general
a = jnp.ones((8, 16, 256), jnp.float32)
b = jnp.ones((8, 2, 256), jnp.float32)


def k5(a_ref, b_ref, out_ref):
    out_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


run("P5 batched A@B^T", lambda a, b: pl.pallas_call(
    k5,
    out_shape=jax.ShapeDtypeStruct((8, 16, 2), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(a, b), a, b)

print("jax", jax.__version__)
