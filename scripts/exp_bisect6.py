"""Workaround primitives for the 16-wide dynamic lane slice crash."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn, *args, ref=None):
    try:
        out = jax.block_until_ready(jax.jit(fn)(*args))
        msg = f"OK   {name}"
        if ref is not None:
            msg += f"  err={float(jnp.abs(out - ref).max()):.1e}"
        print(msg, flush=True)
        return out
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:130]}",
              flush=True)
        return None


T, bu, K = 8, 16, 16
C = K * bu
NPAD = 4096
xc = jnp.asarray(np.arange(2 * NPAD, dtype=np.float32).reshape(2, NPAD))

# R1: 16-wide dyn lane slice with multiple_of hint
def kr1(xc_ref, out_ref, xg_ref):
    i = pl.program_id(0)
    off = pl.multiple_of(i * 16, 16)
    xg_ref[0, 0:16] = xc_ref[0, pl.ds(off, 16)]
    out_ref[:] = xg_ref[:] * 1.0


run("R1 multiple_of(16) dyn slice", lambda x: pl.pallas_call(
    kr1,
    grid=(4,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((T, C), lambda i: (0, 0)),
    out_shape=jax.ShapeDtypeStruct((T, C), jnp.float32),
    scratch_shapes=[pltpu.VMEM((T, C), jnp.float32)],
)(x), xc)

# R2: aligned 128 load + dynamic roll + static 16 store
def kr2(xc_ref, out_ref, xg_ref):
    i = pl.program_id(0)
    c = i * 3 + 1          # arbitrary block index
    base = (c * bu) // 128 * 128
    phase = (c * bu) % 128
    w = xc_ref[0:1, pl.ds(base, 128)]          # (1, 128) aligned
    rolled = pltpu.roll(w, -phase, 1)
    xg_ref[0, 0:16] = rolled[0, 0:16]
    out_ref[:] = xg_ref[:] * 1.0


run("R2 aligned load + dyn roll", lambda x: pl.pallas_call(
    kr2,
    grid=(4,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((T, C), lambda i: (0, 0)),
    out_shape=jax.ShapeDtypeStruct((T, C), jnp.float32),
    scratch_shapes=[pltpu.VMEM((T, C), jnp.float32)],
)(x), xc)

# R3: width-1 dynamic lane slice (x in (16, n_vb) layout)
xcT = jnp.asarray(np.arange(16 * 256, dtype=np.float32).reshape(16, 256))


def kr3(xt_ref, out_ref, xg_ref):
    i = pl.program_id(0)
    c = i * 3 + 1
    xg_ref[:, pl.ds(i, 1)] = xt_ref[:, pl.ds(c, 1)]
    out_ref[:] = xg_ref[:] * 1.0


run("R3 width-1 dyn lane slice", lambda x: pl.pallas_call(
    kr3,
    grid=(4,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((16, 256), lambda i: (0, 0)),
    out_shape=jax.ShapeDtypeStruct((16, 256), jnp.float32),
    scratch_shapes=[pltpu.VMEM((16, 256), jnp.float32)],
)(x), xcT)

# R4: in-kernel jnp.take along lanes (vector gather)
idx = jnp.asarray((np.arange(256) * 7) % 4096, jnp.int32)


def kr4(x_ref, i_ref, out_ref):
    out_ref[:] = jnp.take(x_ref[0], i_ref[0], axis=0)[None, :]


run("R4 jnp.take lane gather", lambda x, i: pl.pallas_call(
    kr4,
    out_shape=jax.ShapeDtypeStruct((1, 256), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x, i[None, :]), xc, idx)

# R4b: take_along_axis 2D
def kr4b(x_ref, i_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)


run("R4b take_along_axis lanes", lambda x, i: pl.pallas_call(
    kr4b,
    out_shape=jax.ShapeDtypeStruct((2, 256), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x, jnp.stack([i, i])), xc, idx)

# R5: (2,16) static-target write into 3D scratch from static source
def kr5(xc_ref, out_ref, xg_ref):
    xg_ref[0, :, 0:16] = xc_ref[:, 32:48]
    out_ref[:] = xg_ref[:] * 1.0


run("R5 (2,16) static write 3D scratch", lambda x: pl.pallas_call(
    kr5,
    grid=(2,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((T, 2, C), lambda i: (0, 0, 0)),
    out_shape=jax.ShapeDtypeStruct((T, 2, C), jnp.float32),
    scratch_shapes=[pltpu.VMEM((T, 2, C), jnp.float32)],
)(x), xc)

# R6: dynamic SUBLANE slice, 16 wide (x as (N/128, 128) rows)
x2 = jnp.asarray(np.arange(NPAD, dtype=np.float32).reshape(-1, 128))


def kr6(x_ref, out_ref):
    i = pl.program_id(0)
    out_ref[:] = x_ref[pl.ds(i * 2, 8), :] * 1.0


run("R6 dyn sublane slice", lambda x: pl.pallas_call(
    kr6,
    grid=(2,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
    out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
)(x), x2)
