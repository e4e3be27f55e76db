"""Validate the lane-flat gather formulation of the F matvec end-to-end
(scan-chained, honest): does the reshape after the flat take re-fuse
into a strided (slow) gather, and does an optimization_barrier help?
Also: node-ELL mass apply cost and alternatives.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

z = np.load("/tmp/gather_tables.npz")
cols = jnp.asarray(z["cols16"])
n_vb, K = cols.shape
bu, D = 16, 2
rng = np.random.default_rng(0)
vals = jnp.asarray(rng.standard_normal((n_vb, K, bu, bu)).astype(np.float32))
x0 = jnp.asarray(rng.standard_normal((n_vb * bu, D)).astype(np.float32))

def timed(name, step, N=48, rep=2, x0=x0):
    def prog(x, vals):
        def body(xc, _):
            y = step(xc, vals)
            return y * 1e-3, None
        xc, _ = jax.lax.scan(body, x, None, length=N)
        return xc
    prog = jax.jit(prog)
    out = prog(x0, vals); float(np.asarray(out).reshape(-1)[0])
    best = None
    for _ in range(rep):
        t0 = time.perf_counter()
        out = prog(x0, vals); float(np.asarray(out).reshape(-1)[0])
        dt = (time.perf_counter() - t0) / N
        best = dt if best is None else min(best, dt)
    print(f"{name:52s} {best*1e3:8.3f} ms", flush=True)

# current formulation
def mv_cur(x, vals):
    xb = x.reshape(n_vb, bu, D)
    xg = jnp.take(xb, cols, axis=0, mode="clip")
    return (vals[..., None] * xg[:, :, None]).sum(axis=(1, 3)).reshape(-1, D)
timed("current: sliced gather + mult-reduce", mv_cur)

# flat gather + reshape + mult-reduce
def mv_flat(x, vals):
    xb = x.reshape(n_vb, bu * D)
    xg = jnp.take(xb, cols, axis=0, mode="clip")          # (n_vb,K,32)
    xg = xg.reshape(n_vb, K, bu, D)
    return (vals[..., None] * xg[:, :, None]).sum(axis=(1, 3)).reshape(-1, D)
timed("flat gather + reshape + mult-reduce", mv_flat)

# flat gather + barrier + reshape
def mv_flatb(x, vals):
    xb = x.reshape(n_vb, bu * D)
    xg = jnp.take(xb, cols, axis=0, mode="clip")
    xg = jax.lax.optimization_barrier(xg)
    xg = xg.reshape(n_vb, K, bu, D)
    return (vals[..., None] * xg[:, :, None]).sum(axis=(1, 3)).reshape(-1, D)
timed("flat gather + BARRIER + reshape + mult-reduce", mv_flatb)

# flat gather + interleaved-domain reduce (no reshape of xg; reshape vals instead)
# y[n,a,dd] = sum_k sum_b vals[n,k,a,b] * xg[n,k,b*D+dd]
vals_i = None
def mv_inter(x, vals):
    xb = x.reshape(n_vb, bu * D)
    xg = jnp.take(xb, cols, axis=0, mode="clip")          # (n_vb,K,32)
    # duplicate vals across d on the minor axis: (n_vb,K,a, b*D+dd) pattern via repeat
    v2 = jnp.repeat(vals, D, axis=3)                       # (n_vb,K,16,32)
    y = (v2[:, :, :, :] * xg[:, :, None, :]).reshape(n_vb, K, bu, bu, D).sum(axis=(1, 3))
    return y.reshape(-1, D)
timed("flat gather + interleaved reduce (repeat vals)", mv_inter)

# correctness check (CPU-free): compare on device via scalar pulls
y1 = jax.jit(mv_cur)(x0, vals)
y2 = jax.jit(mv_flat)(x0, vals)
y3 = jax.jit(mv_flatb)(x0, vals)
print("err flat", float(jnp.abs(y1-y2).max()), " err flatb", float(jnp.abs(y1-y3).max()))

# ---- node mass apply ----
Kn = 28
n_p2 = n_vb * bu
ncols = jnp.asarray((np.arange(n_p2)[:, None] + rng.integers(-200, 200, (n_p2, Kn))).clip(0, n_p2-1).astype(np.int32))
nvals = jnp.asarray(rng.standard_normal((n_p2, Kn)).astype(np.float32))
def nm_cur(x, _):
    xg = jnp.take(x, ncols, axis=0, mode="clip")        # (n,K,2)
    return (nvals[:, :, None] * xg).sum(axis=1)
timed("node-ELL mass apply (current, (1,2) rows)", nm_cur, N=16)

# blocked-x variant: gather 32-lane block rows using node cols // 16, then select
# the right node via one-hot? -> instead: gather flat interleaved with node cols
def nm_flat(x, _):
    xf = x.reshape(-1)                                   # (2n,)
    c2 = ncols.astype(jnp.int32) * 2
    g0 = jnp.take(xf, c2, mode="clip")
    g1 = jnp.take(xf, c2 + 1, mode="clip")
    return jnp.stack([(nvals * g0).sum(axis=1), (nvals * g1).sum(axis=1)], axis=1)
timed("node mass: two scalar gathers", nm_flat, N=16)
