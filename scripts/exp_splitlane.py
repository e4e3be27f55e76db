"""Split-lane F-matvec candidates: keep solver vectors as (n_vb, 32) with
components in separate lane halves [comp0 nodes | comp1 nodes], so the
gather + blocked mult-reduce fuses without any reshape/relayout.

Also probes per-row gather cost vs table width (32/64/128 lanes).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
n_vb, K, bu = 28160, 16, 16
vals = jnp.asarray(rng.standard_normal((n_vb, K, bu, bu)).astype(np.float32))
cols = jnp.asarray(np.load("/tmp/gather_tables.npz")["cols16"][:n_vb])
x_sl = jnp.asarray(rng.standard_normal((n_vb, 32)).astype(np.float32))


def timed(name, step, args, N=48, rep=3):
    def prog(x, v):
        def body(c, _):
            y = step(c, v)
            return y * 1e-3, None
        c, _ = jax.lax.scan(body, x, None, length=N)
        return c
    prog = jax.jit(prog)
    out = prog(*args); float(np.asarray(out).reshape(-1)[0])
    best = None
    for _ in range(rep):
        t0 = time.perf_counter()
        out = prog(*args); float(np.asarray(out).reshape(-1)[0])
        dt = (time.perf_counter() - t0) / N
        best = dt if best is None else min(best, dt)
    print(f"{name:58s} {best*1e3:8.3f} ms", flush=True)
    return out


# A. current formulation baseline: x (n, 2) interleaved, sliced gather
x_il = jnp.asarray(rng.standard_normal((n_vb * bu, 2)).astype(np.float32))
def mv_cur(x, v):
    xb = x.reshape(n_vb, bu, 2)
    xg = jnp.take(xb, cols, axis=0, mode="clip")
    return (v[..., None] * xg[:, :, None]).sum(axis=(1, 3)).reshape(-1, 2)
timed("A current sliced-gather mult-reduce", mv_cur, (x_il, vals))

# B. split-lane: gather (n_vb,32) rows, einsum halves, no reshape
def mv_sl(x, v):
    xg = jnp.take(x, cols, axis=0, mode="clip")            # (n_vb,K,32)
    y0 = jnp.einsum("ikab,ikb->ia", v, xg[:, :, :16])
    y1 = jnp.einsum("ikab,ikb->ia", v, xg[:, :, 16:])
    return jnp.concatenate([y0, y1], axis=1)               # (n_vb,32)
o_b = timed("B split-lane gather + 2 half einsum", mv_sl, (x_sl, vals))

# B2. same but single einsum on (n_vb,K,2,16) view via reshape
def mv_sl2(x, v):
    xg = jnp.take(x, cols, axis=0, mode="clip")
    xg2 = xg.reshape(n_vb, K, 2, bu)
    y = jnp.einsum("ikab,ikdb->iad", v, xg2)               # (n_vb,16,2)
    return y.transpose(0, 2, 1).reshape(n_vb, 32)
timed("B2 split-lane + (2,16) reshape einsum", mv_sl2, (x_sl, vals))

# C. B with barrier after gather
def mv_slb(x, v):
    xg = jnp.take(x, cols, axis=0, mode="clip")
    xg = jax.lax.optimization_barrier(xg)
    y0 = jnp.einsum("ikab,ikb->ia", v, xg[:, :, :16])
    y1 = jnp.einsum("ikab,ikb->ia", v, xg[:, :, 16:])
    return jnp.concatenate([y0, y1], axis=1)
timed("C split-lane barrier + 2 half einsum", mv_slb, (x_sl, vals))

# D. B with bf16 values
vals_bf = vals.astype(jnp.bfloat16)
def mv_sl_bf(x, v):
    xg = jnp.take(x, cols, axis=0, mode="clip")
    vf = v.astype(jnp.float32)
    y0 = jnp.einsum("ikab,ikb->ia", vf, xg[:, :, :16])
    y1 = jnp.einsum("ikab,ikb->ia", vf, xg[:, :, 16:])
    return jnp.concatenate([y0, y1], axis=1)
timed("D split-lane bf16 vals", mv_sl_bf, (x_sl, vals_bf))

# E. floor: gather + plain sum (no values)
def mv_floor(x, v):
    xg = jnp.take(x, cols, axis=0, mode="clip")
    return xg.sum(axis=1)
timed("E gather+sum floor", mv_floor, (x_sl, vals))

# F. explicit mult-reduce (broadcast style) on split-lane halves
def mv_sl_mr(x, v):
    xg = jnp.take(x, cols, axis=0, mode="clip")
    y0 = (v * xg[:, :, None, :16]).sum(axis=(1, 3))
    y1 = (v * xg[:, :, None, 16:]).sum(axis=(1, 3))
    return jnp.concatenate([y0, y1], axis=1)
timed("F split-lane broadcast mult-reduce", mv_sl_mr, (x_sl, vals))

# correctness: B vs A with matching data layout
xi = np.asarray(x_sl).reshape(n_vb, 2, bu)               # comp-major halves
x_equiv = np.transpose(xi, (0, 2, 1)).reshape(-1, 2)     # node-major (n,2)
y_a = np.asarray(jax.jit(mv_cur)(jnp.asarray(x_equiv), vals))
y_b = np.asarray(jax.jit(mv_sl)(x_sl, vals))
y_b_nodes = y_b.reshape(n_vb, 2, bu).transpose(0, 2, 1).reshape(-1, 2)
print("B vs A max err:", np.abs(y_a - y_b_nodes).max())

# G. gather cost vs width: 450k rows from (n, W) tables, fused sum
for W in (32, 64, 128):
    xw = jnp.asarray(rng.standard_normal((n_vb, W)).astype(np.float32))
    def mvw(x, v):
        xg = jnp.take(x, cols, axis=0, mode="clip")
        return xg.sum(axis=1)
    timed(f"G gather+sum ({n_vb},{W}) 450k rows [{n_vb*K*W*4/1e6:.0f}MB]",
          mvw, (xw, vals))
