"""Mosaic capability + speed probe: gather from a VMEM-resident table.

Decides the F-matvec kernel design. Questions:
 1. Which gather idioms compile on this (remote) Mosaic toolchain?
 2. How big can a VMEM-resident array be?
 3. How fast is a sublane gather of (1,32)/(1,128) rows at bench scale?

Usage: cap | speed
"""
import sys, time
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
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:120]}", flush=True)
        return None


def cap():
    x = jnp.asarray(np.arange(4096 * 128, dtype=np.float32).reshape(4096, 128))
    idx = jnp.asarray((np.arange(256) * 13 % 4096).astype(np.int32))
    idx2 = jnp.asarray((np.arange(256 * 128).reshape(256, 128) * 7 % 4096).astype(np.int32))

    # A: jnp.take axis=0 (sublane gather, shared across lanes)
    def ka(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=0)
    def fa(x, idx):
        return pl.pallas_call(
            ka,
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)
    oa = run("take axis=0 1D idx (256 rows from 4096x128)", fa, x, idx)
    if oa is not None:
        ref = np.asarray(x)[np.asarray(idx)]
        print("   correct:", np.array_equal(np.asarray(oa), ref))

    # B: take_along_axis axis=0 (per-lane row indices)
    def kb(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)
    def fb(x, idx2):
        return pl.pallas_call(
            kb,
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx2)
    ob = run("take_along_axis axis=0 per-lane idx", fb, x, idx2)
    if ob is not None:
        ref = np.take_along_axis(np.asarray(x), np.asarray(idx2), axis=0)
        print("   correct:", np.array_equal(np.asarray(ob), ref))

    # C: lane gather via take axis=1
    xl = jnp.asarray(np.arange(8 * 512, dtype=np.float32).reshape(8, 512))
    idxl = jnp.asarray((np.arange(128) * 3 % 512).astype(np.int32))
    def kc(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=1)
    def fc(x, idx):
        return pl.pallas_call(
            kc,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(xl, idxl)
    oc = run("take axis=1 (lane gather)", fc, xl, idxl)
    if oc is not None:
        ref = np.asarray(xl)[:, np.asarray(idxl)]
        print("   correct:", np.array_equal(np.asarray(oc), ref))

    # D: VMEM capacity: whole-array input at (28160, 32) f32 (3.6MB data,
    #    14.4MB if lane-padded to 128)
    big = jnp.asarray(np.ones((28160, 32), np.float32))
    idxb = jnp.asarray((np.arange(512) * 55 % 28160).astype(np.int32))
    def kd(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=0)
    def fd(x, idx):
        return pl.pallas_call(
            kd,
            out_shape=jax.ShapeDtypeStruct((512, 32), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)
    od = run("VMEM-resident (28160,32) + take 512 rows", fd, big, idxb)

    # E: same but (7040,128) flat layout
    big2 = jnp.asarray(np.ones((7040, 128), np.float32))
    idxe = jnp.asarray((np.arange(512) * 13 % 7040).astype(np.int32))
    def fe(x, idx):
        return pl.pallas_call(
            kd,
            out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)
    oe = run("VMEM-resident (7040,128) + take 512 rows", fe, big2, idxe)

    # F: dynamic sublane ds in fori_loop (serial baseline), 512 rows
    def kf(x_ref, i_ref, o_ref):
        def body(j, _):
            o_ref[pl.ds(j, 1), :] = x_ref[pl.ds(i_ref[j], 1), :]
            return 0
        jax.lax.fori_loop(0, 512, body, 0)
    def ff(x, idx):
        return pl.pallas_call(
            kf,
            out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec((512,), memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)
    of = run("serial fori ds-row copy (SMEM idx)", ff, big2, idxe)


def speed():
    rng = np.random.default_rng(0)
    n_vb, K = 28160, 16
    T = 256            # row-blocks per grid step
    n_g = n_vb // T    # grid size
    x = jnp.asarray(rng.standard_normal((n_vb, 32)).astype(np.float32))
    x128 = jnp.asarray(rng.standard_normal((7040, 128)).astype(np.float32))
    cols = jnp.asarray((rng.integers(0, n_vb, (n_vb, K))).astype(np.int32))
    cols128 = jnp.asarray((rng.integers(0, 7040, (7040, 14))).astype(np.int32))

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

    # kernel: grid over row tiles; x whole in VMEM; gather T*K rows, sum over K
    def kg(c_ref, x_ref, o_ref):
        xg = jnp.take(x_ref[:], c_ref[:].reshape(-1), axis=0)  # (T*K,32)
        o_ref[:] = xg.reshape(T, K, 32).sum(axis=1)
    def fg(x, cols):
        return pl.pallas_call(
            kg,
            grid=(n_g,),
            out_shape=jax.ShapeDtypeStruct((n_vb, 32), jnp.float32),
            in_specs=[pl.BlockSpec((T, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(cols, x)
    def prog_g(x, cols):
        def body(xc, _):
            y = fg(xc, cols)
            return y * 1e-3, None
        xc, _ = jax.lax.scan(body, x, None, length=48)
        return xc
    try:
        timed(f"pallas take (28160,32) K={K} sum", prog_g, (x, cols))
    except Exception as e:
        print("FAIL speed-32:", str(e)[:140])

    # same at 128-lane layout
    T2, K2 = 128, 14
    n_g2 = 7040 // T2
    def kh(c_ref, x_ref, o_ref):
        xg = jnp.take(x_ref[:], c_ref[:].reshape(-1), axis=0)  # (T2*K2,128)
        o_ref[:] = xg.reshape(T2, K2, 128).sum(axis=1)
    def fh(x, cols):
        return pl.pallas_call(
            kh,
            grid=(n_g2,),
            out_shape=jax.ShapeDtypeStruct((7040, 128), jnp.float32),
            in_specs=[pl.BlockSpec((T2, K2), lambda i: (i, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T2, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(cols, x)
    def prog_h(x, cols):
        def body(xc, _):
            y = fh(xc, cols)
            return y * 1e-3, None
        xc, _ = jax.lax.scan(body, x, None, length=48)
        return xc
    try:
        timed(f"pallas take (7040,128) K={K2} sum", prog_h, (x128, cols128))
    except Exception as e:
        print("FAIL speed-128:", str(e)[:140])


if __name__ == "__main__":
    {"cap": cap, "speed": speed}[sys.argv[1]]()
