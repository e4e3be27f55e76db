"""Bisect Mosaic's gather shape rules: which (input, indices) combos lower."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, out_shape, args, check=None):
    def f(*a):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in a],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a)
    try:
        out = jax.block_until_ready(jax.jit(f)(*args))
        ok = "" if check is None else f"  correct={np.allclose(np.asarray(out), check)}"
        print(f"OK   {name}{ok}", flush=True)
        return out
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:100]}", flush=True)
        return None


npx = np.arange(512 * 128, dtype=np.float32).reshape(512, 128)
x = jnp.asarray(npx)

# 1. take_along_axis axis=0, idx SAME shape as x
npi = (np.arange(512 * 128).reshape(512, 128) * 7 % 512).astype(np.int32)
i_full = jnp.asarray(npi)
def k1(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)
run("taa axis=0 idx==x shape (512,128)", k1, (512, 128), (x, i_full),
    np.take_along_axis(npx, npi, axis=0))

# 2. taa axis=-1 (lane), idx same shape
npi2 = (np.arange(512 * 128).reshape(512, 128) * 11 % 128).astype(np.int32)
i2 = jnp.asarray(npi2)
def k2(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)
run("taa axis=1 idx==x shape (512,128)", k2, (512, 128), (x, i2),
    np.take_along_axis(npx, npi2, axis=1))

# 3. taa axis=0 with FEWER output rows (256,128)
npi3 = (np.arange(256 * 128).reshape(256, 128) * 7 % 512).astype(np.int32)
i3 = jnp.asarray(npi3)
run("taa axis=0 idx (256,128) from (512,128)", k1, (256, 128), (x, i3),
    np.take_along_axis(npx, npi3, axis=0))

# 4. taa axis=0 with MORE output rows (1024,128)
npi4 = (np.arange(1024 * 128).reshape(1024, 128) * 7 % 512).astype(np.int32)
i4 = jnp.asarray(npi4)
run("taa axis=0 idx (1024,128) from (512,128)", k1, (1024, 128), (x, i4),
    np.take_along_axis(npx, npi4, axis=0))

# 5. bigger table: (8192,128), idx (1024,128)
npx5 = np.arange(8192 * 128, dtype=np.float32).reshape(8192, 128)
x5 = jnp.asarray(npx5)
npi5 = (np.arange(1024 * 128).reshape(1024, 128) * 37 % 8192).astype(np.int32)
i5 = jnp.asarray(npi5)
run("taa axis=0 idx (1024,128) from (8192,128)", k1, (1024, 128), (x5, i5),
    np.take_along_axis(npx5, npi5, axis=0))

# 6. minor dim 32 table
npx6 = np.arange(512 * 32, dtype=np.float32).reshape(512, 32)
x6 = jnp.asarray(npx6)
npi6 = (np.arange(256 * 32).reshape(256, 32) * 7 % 512).astype(np.int32)
i6 = jnp.asarray(npi6)
run("taa axis=0 idx (256,32) from (512,32)", k1, (256, 32), (x6, i6),
    np.take_along_axis(npx6, npi6, axis=0))

# 7. 3D: batch of independent lane-gathers
npx7 = np.arange(8 * 8 * 128, dtype=np.float32).reshape(8, 8, 128)
x7 = jnp.asarray(npx7)
npi7 = (np.arange(8 * 8 * 128).reshape(8, 8, 128) * 3 % 128).astype(np.int32)
i7 = jnp.asarray(npi7)
def k7(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=2)
run("taa axis=2 3D (8,8,128)", k7, (8, 8, 128), (x7, i7),
    np.take_along_axis(npx7, npi7, axis=2))
