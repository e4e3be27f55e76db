"""Final kernel-design bisect: blocked-SMEM cols + scratch gather +
matmul variants, small scale, on-chip correctness."""

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
            outs = out if isinstance(out, (tuple, list)) else (out,)
            errs = [float(jnp.abs(o - r).max()) for o, r in zip(outs, ref)]
            msg += f"  err={errs}"
        print(msg, flush=True)
        return out
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


rng = np.random.default_rng(0)
T, bu, K, D = 8, 16, 16, 2
C = K * bu
n_vb = 2048
NPAD = n_vb * bu
cols_np = ((np.arange(n_vb)[:, None]
            + rng.integers(-6, 7, (n_vb, K))).clip(0, n_vb - 1)
           ).astype(np.int32)
vals_np = rng.standard_normal((n_vb, bu, C)).astype(np.float32)
x_np = rng.standard_normal((NPAD, D)).astype(np.float32)

cols = jnp.asarray(cols_np)
vals = jnp.asarray(vals_np)
xc = jnp.asarray(np.ascontiguousarray(x_np.T))  # (D, NPAD)

# numpy reference
v4 = vals_np.reshape(n_vb, bu, K, bu)
xb = x_np.reshape(n_vb, bu, D)
y_ref = np.einsum("nakb,nkbd->nad", v4, xb[cols_np]).reshape(-1, D)
ref_x, ref_y = (jnp.asarray(y_ref[:, 0].reshape(-1, 1, 128)),
                jnp.asarray(y_ref[:, 1].reshape(-1, 1, 128)))


# ---- V1: per-component batched matvec ----
def kern_v1(cols_ref, vals_ref, xc_ref, outx_ref, outy_ref,
            xgx_ref, xgy_ref):
    for t in range(T):
        for k in range(K):
            c = cols_ref[t, k]
            xgx_ref[t, k * bu:(k + 1) * bu] = xc_ref[0, pl.ds(c * bu, bu)]
            xgy_ref[t, k * bu:(k + 1) * bu] = xc_ref[1, pl.ds(c * bu, bu)]
    accx = jax.lax.dot_general(
        vals_ref[:], xgx_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (T, bu)
    accy = jax.lax.dot_general(
        vals_ref[:], xgy_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    outx_ref[:] = accx.reshape(1, 1, T * bu)
    outy_ref[:] = accy.reshape(1, 1, T * bu)


def make_v1():
    return pl.pallas_call(
        kern_v1,
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
        scratch_shapes=[pltpu.VMEM((T, C), jnp.float32),
                        pltpu.VMEM((T, C), jnp.float32)],
    )


run("V1 per-comp matvec", lambda c, v, x: make_v1()(c, v, x),
    cols, vals, xc, ref=(ref_x, ref_y))


# ---- V2: A@B^T (P5 form) + lane-select per component ----
def kern_v2(cols_ref, vals_ref, xc_ref, outx_ref, outy_ref, xg_ref):
    for t in range(T):
        for k in range(K):
            c = cols_ref[t, k]
            xg_ref[t, 0, k * bu:(k + 1) * bu] = \
                xc_ref[0, pl.ds(c * bu, bu)]
            xg_ref[t, 1, k * bu:(k + 1) * bu] = \
                xc_ref[1, pl.ds(c * bu, bu)]
    acc = jax.lax.dot_general(
        vals_ref[:], xg_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (T, bu, D)
    outx_ref[:] = acc[:, :, 0].reshape(1, 1, T * bu)
    outy_ref[:] = acc[:, :, 1].reshape(1, 1, T * bu)


def make_v2():
    return pl.pallas_call(
        kern_v2,
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
        scratch_shapes=[pltpu.VMEM((T, D, C), jnp.float32)],
    )


run("V2 A@B^T + lane select", lambda c, v, x: make_v2()(c, v, x),
    cols, vals, xc, ref=(ref_x, ref_y))


# ---- V3: stack components on scratch sublanes: xg (2T, C); one matmul
#      per component via sublane slices ----
def kern_v3(cols_ref, vals_ref, xc_ref, outx_ref, outy_ref, xg_ref):
    for t in range(T):
        for k in range(K):
            c = cols_ref[t, k]
            xg_ref[t, k * bu:(k + 1) * bu] = xc_ref[0, pl.ds(c * bu, bu)]
            xg_ref[T + t, k * bu:(k + 1) * bu] = \
                xc_ref[1, pl.ds(c * bu, bu)]
    accx = jax.lax.dot_general(
        vals_ref[:], xg_ref[0:T], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    accy = jax.lax.dot_general(
        vals_ref[:], xg_ref[T:2 * T], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    outx_ref[:] = accx.reshape(1, 1, T * bu)
    outy_ref[:] = accy.reshape(1, 1, T * bu)


def make_v3():
    return pl.pallas_call(
        kern_v3,
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
        scratch_shapes=[pltpu.VMEM((2 * T, C), jnp.float32)],
    )


run("V3 sublane-stacked", lambda c, v, x: make_v3()(c, v, x),
    cols, vals, xc, ref=(ref_x, ref_y))
