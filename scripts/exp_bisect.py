"""Bisect the Mosaic remote-compile failure of the fused F kernel."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn, *args):
    try:
        out = jax.block_until_ready(jax.jit(fn)(*args))
        t0 = time.perf_counter()
        for _ in range(10):
            out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        print(f"OK   {name}: {(time.perf_counter()-t0)/10*1e3:.3f} ms",
              flush=True)
        return out
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:150]}",
              flush=True)
        return None


rng = np.random.default_rng(0)
bu, K, D, T = 16, 16, 2, 8
n_vb = 2048  # small: scalar-prefetch cols = 2048*16*4 = 128 KB
NPAD = n_vb * bu
cols_np = (np.arange(n_vb)[:, None]
           + rng.integers(-6, 7, (n_vb, K))).clip(0, n_vb - 1)
cols = jnp.asarray(cols_np, jnp.int32)
vals_rm = jnp.asarray(
    rng.standard_normal((n_vb, bu, K * bu)).astype(np.float32))
xc = jnp.asarray(rng.standard_normal((D, NPAD)).astype(np.float32))

# E0: trivial kernel with scalar prefetch + VMEM xc, no slicing
def kern0(cols_ref, vals_ref, xc_ref, out_ref):
    out_ref[:] = jnp.sum(vals_ref[:], axis=2)[:, :, None] \
        .reshape(out_ref.shape[0], 1) * jnp.ones((1, D), jnp.float32)


def make(kern, scratch=None):
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_vb // T,),
            in_specs=[
                pl.BlockSpec((T, bu, K * bu), lambda i, c: (i, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T * bu, D), lambda i, c: (i, 0)),
            scratch_shapes=scratch or [],
        ),
        out_shape=jax.ShapeDtypeStruct((NPAD, D), jnp.float32),
    )


run("E0 trivial+prefetch", make(kern0), cols, vals_rm, xc)


# E1: one dynamic slice copy into scratch, no matmul
def kern1(cols_ref, vals_ref, xc_ref, out_ref, xg_ref):
    i = pl.program_id(0)
    c = cols_ref[i * T, 0]
    xg_ref[0, :, 0:bu] = xc_ref[:, pl.ds(c * bu, bu)]
    out_ref[:] = jnp.zeros_like(out_ref) + xg_ref[0, 0, 0]


run("E1 single slice copy", make(
    kern1, [pltpu.VMEM((T, D, K * bu), jnp.float32)]), cols, vals_rm, xc)


# E2: full T*K slice loop, no matmul
def kern2(cols_ref, vals_ref, xc_ref, out_ref, xg_ref):
    i = pl.program_id(0)
    for t in range(T):
        for k in range(K):
            c = cols_ref[i * T + t, k]
            xg_ref[t, :, k * bu:(k + 1) * bu] = \
                xc_ref[:, pl.ds(c * bu, bu)]
    out_ref[:] = jnp.zeros_like(out_ref) + xg_ref[0, 0, 0]


run("E2 full slice loop", make(
    kern2, [pltpu.VMEM((T, D, K * bu), jnp.float32)]), cols, vals_rm, xc)


# E3: matmul only (A @ B^T batched), scratch pre-zeroed
def kern3(cols_ref, vals_ref, xc_ref, out_ref, xg_ref):
    xg_ref[...] = jnp.ones_like(xg_ref)
    acc = jax.lax.dot_general(
        vals_ref[:], xg_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out_ref[:] = acc.reshape(T * bu, D)


run("E3 batched A@B^T matmul", make(
    kern3, [pltpu.VMEM((T, D, K * bu), jnp.float32)]), cols, vals_rm, xc)


# E4: full kernel (slices + matmul) at small size
def kern4(cols_ref, vals_ref, xc_ref, out_ref, xg_ref):
    i = pl.program_id(0)
    for t in range(T):
        for k in range(K):
            c = cols_ref[i * T + t, k]
            xg_ref[t, :, k * bu:(k + 1) * bu] = \
                xc_ref[:, pl.ds(c * bu, bu)]
    acc = jax.lax.dot_general(
        vals_ref[:], xg_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out_ref[:] = acc.reshape(T * bu, D)


y = run("E4 full small", make(
    kern4, [pltpu.VMEM((T, D, K * bu), jnp.float32)]), cols, vals_rm, xc)
if y is not None:
    # correctness vs numpy
    v = np.asarray(vals_rm).reshape(n_vb, bu, K, bu).transpose(0, 2, 1, 3)
    xb = np.asarray(xc).T.reshape(n_vb, bu, D)
    acc = np.einsum("nkab,nkbd->nad", v[np.arange(n_vb)[:, None],
                                        np.arange(K)[None, :]],
                    xb[cols_np])
    ref = acc.reshape(-1, D)
    print("E4 max err:", np.abs(np.asarray(y) - ref).max())
