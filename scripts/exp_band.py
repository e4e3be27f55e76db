"""Pallas band-SpMV prototype v2: x padded in HBM(ANY), window DMA to
scratch per grid step, per-diagonal batched matmul.  Measures fp32/bf16."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_VB, BU, D = 28160, 16, 2
N_P2 = N_VB * BU
W = 4
NB = 2 * W + 1


def band_kernel(vals_ref, xpad_ref, out_ref, xw_ref, sem):
    # vals_ref: (T, NB, BU, BU) VMEM (auto); xpad_ref: ANY (whole)
    # xw_ref: VMEM scratch ((T + 2W) * BU, D)
    T = vals_ref.shape[0]
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        xpad_ref.at[pl.ds(i * T * BU, (T + 2 * W) * BU), :], xw_ref, sem)
    cp.start()
    cp.wait()
    acc = jnp.zeros((T, BU, D), jnp.float32)
    for w in range(NB):
        xw = xw_ref[pl.ds(w * BU, T * BU), :].reshape(T, BU, D)
        a = vals_ref[:, w]
        acc += jax.lax.dot_general(
            a, xw, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    out_ref[:] = acc.reshape(T * BU, D)


def make_band(T, vdtype):
    grid = N_VB // T
    return pl.pallas_call(
        band_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((T, NB, BU, BU), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((T * BU, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N_P2, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(((T + 2 * W) * BU, D), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )


def ref_band(vals, xpad):
    xb = xpad.reshape(-1, BU, D)
    acc = np.zeros((N_VB, BU, D), np.float32)
    v = np.asarray(vals, np.float32)
    for w in range(NB):
        acc += np.einsum("nab,nbd->nad", v[:, w], xb[w:w + N_VB])
    return acc.reshape(N_P2, D)


def main():
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.standard_normal((N_VB, NB, BU, BU)), jnp.float32)
    xpad = jnp.asarray(
        rng.standard_normal(((N_VB + 2 * W) * BU, D)), jnp.float32)

    for T in (32, 64, 128):
        try:
            f = jax.jit(make_band(T, jnp.float32))
            y = np.asarray(f(vals, xpad))
            ok = np.allclose(y, ref_band(vals, xpad), atol=1e-3)
            # timing: pipelined (device-bound at these sizes)
            jax.block_until_ready(f(vals, xpad))
            t0 = time.perf_counter()
            n = 30
            for _ in range(n):
                out = f(vals, xpad)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / n
            print(f"band fp32 T={T}: {dt*1e3:.3f} ms  correct={ok}",
                  flush=True)
        except Exception as e:
            print(f"T={T} failed: {type(e).__name__}: {str(e)[:400]}")

    # bf16 values variant
    vals16 = vals.astype(jnp.bfloat16)

    def band16_kernel(vals_ref, xpad_ref, out_ref, xw_ref, sem):
        T = vals_ref.shape[0]
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            xpad_ref.at[pl.ds(i * T * BU, (T + 2 * W) * BU), :], xw_ref, sem)
        cp.start()
        cp.wait()
        acc = jnp.zeros((T, BU, D), jnp.float32)
        for w in range(NB):
            xw = xw_ref[pl.ds(w * BU, T * BU), :].reshape(T, BU, D)
            a = vals_ref[:, w]
            acc += jax.lax.dot_general(
                a, xw.astype(jnp.bfloat16), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        out_ref[:] = acc.reshape(T * BU, D)

    for T in (64,):
        f = jax.jit(pl.pallas_call(
            band16_kernel,
            grid=(N_VB // T,),
            in_specs=[
                pl.BlockSpec((T, NB, BU, BU), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((T * BU, D), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((N_P2, D), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM(((T + 2 * W) * BU, D), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ))
        y = np.asarray(f(vals16, xpad))
        ok = np.allclose(y, ref_band(vals, xpad), atol=0.3)
        jax.block_until_ready(f(vals16, xpad))
        t0 = time.perf_counter()
        n = 30
        for _ in range(n):
            out = f(vals16, xpad)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"band bf16 T={T}: {dt*1e3:.3f} ms  correct={ok}", flush=True)


if __name__ == "__main__":
    main()
