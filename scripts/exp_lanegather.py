"""Lane-gather (taa axis=1) width and speed probes, Pallas vs plain XLA.

The windowed F-matvec design needs o[r,l] = x[r, idx[r,l]] for minor dims
of 512-2048 (window width). Probes max supported width + honest speed.
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def k_taa(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)


def pallas_taa(x, idx):
    return pl.pallas_call(
        k_taa,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


def cap():
    for R, W in ((512, 128), (512, 256), (256, 512), (128, 1024), (64, 2048)):
        npx = np.arange(R * W, dtype=np.float32).reshape(R, W)
        npi = (np.arange(R * W).reshape(R, W) * 13 % W).astype(np.int32)
        x, i = jnp.asarray(npx), jnp.asarray(npi)
        ref = np.take_along_axis(npx, npi, axis=1)
        try:
            out = jax.block_until_ready(jax.jit(pallas_taa)(x, i))
            print(f"OK   pallas taa ({R},{W})  correct={np.allclose(np.asarray(out), ref)}",
                  flush=True)
        except Exception as e:
            print(f"FAIL pallas taa ({R},{W}): {type(e).__name__}: {str(e)[:90]}",
                  flush=True)
    # plain XLA for the same shapes
    for R, W in ((512, 128), (128, 1024)):
        npx = np.arange(R * W, dtype=np.float32).reshape(R, W)
        npi = (np.arange(R * W).reshape(R, W) * 13 % W).astype(np.int32)
        x, i = jnp.asarray(npx), jnp.asarray(npi)
        ref = np.take_along_axis(npx, npi, axis=1)
        out = jax.block_until_ready(jax.jit(
            lambda x, i: jnp.take_along_axis(x, i, axis=1))(x, i))
        print(f"XLA  taa ({R},{W})  correct={np.allclose(np.asarray(out), ref)}",
              flush=True)


def timed(name, prog, args, N=48, rep=3):
    prog = jax.jit(prog)
    out = prog(*args); float(np.asarray(out).reshape(-1)[0])
    best = None
    for _ in range(rep):
        t0 = time.perf_counter()
        out = prog(*args); float(np.asarray(out).reshape(-1)[0])
        dt = (time.perf_counter() - t0) / N
        best = dt if best is None else min(best, dt)
    print(f"{name:56s} {best*1e3:8.3f} ms", flush=True)


def speed():
    rng = np.random.default_rng(0)
    # bench scale: 450k output nodes, K=32 slots, windows of W lanes
    # rows R = n_gather_elems / lanes;  gather volume = n*K*2 comps
    # model: total gathered = 450k nodes x 32 slots x 2 comps = 28.8M f32
    # as (R, W) same-shape taa passes: R*W = 28.8M
    for W in (128, 512, 1024):
        R = 28_835_840 // W
        x = jnp.asarray(rng.standard_normal((R, W)).astype(np.float32))
        idx = jnp.asarray((rng.integers(0, W, (R, W))).astype(np.int32))

        def prog_xla(x, idx):
            def body(c, _):
                y = jnp.take_along_axis(c, idx, axis=1)
                return y * 1.0000001, None
            c, _ = jax.lax.scan(body, x, None, length=24)
            return c
        timed(f"XLA taa ({R},{W}) [28.8M f32 gathered]", prog_xla, (x, idx), N=24)

    # pallas, gridded over rows, W=1024
    W = 1024
    R = 28_835_840 // W
    TR = 256
    x = jnp.asarray(rng.standard_normal((R, W)).astype(np.float32))
    idx = jnp.asarray((rng.integers(0, W, (R, W))).astype(np.int32))

    def f_pallas(x, idx):
        return pl.pallas_call(
            k_taa,
            grid=(R // TR,),
            out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
            in_specs=[pl.BlockSpec((TR, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((TR, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TR, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(x, idx)

    def prog_p(x, idx):
        def body(c, _):
            y = f_pallas(c, idx)
            return y * 1.0000001, None
        c, _ = jax.lax.scan(body, x, None, length=24)
        return c
    try:
        timed(f"pallas taa gridded ({R},{W})", prog_p, (x, idx), N=24)
    except Exception as e:
        print("FAIL pallas gridded:", str(e)[:140])


if __name__ == "__main__":
    {"cap": cap, "speed": speed}[sys.argv[1]]()


def speed128():
    rng = np.random.default_rng(0)
    W = 128
    R = 28_835_840 // W   # 225280 rows
    for TR in (256, 512, 1024):
        x = jnp.asarray(rng.standard_normal((R, W)).astype(np.float32))
        idx = jnp.asarray((rng.integers(0, W, (R, W))).astype(np.int32))

        def f_pallas(x, idx, TR=TR):
            return pl.pallas_call(
                k_taa,
                grid=(R // TR,),
                out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
                in_specs=[pl.BlockSpec((TR, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                          pl.BlockSpec((TR, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((TR, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            )(x, idx)

        def prog_p(x, idx):
            def body(c, _):
                y = f_pallas(c, idx)
                return y * 1.0000001, None
            c, _ = jax.lax.scan(body, x, None, length=24)
            return c
        try:
            timed(f"pallas taa gridded ({R},{W}) TR={TR}", prog_p, (x, idx), N=24)
        except Exception as e:
            print(f"FAIL pallas TR={TR}:", str(e)[:120])
