"""Round 2 of flat-matvec variants: barrier + dot_general, layout
variations, blocked mass apply."""
import time
import numpy as np
import jax
import jax.numpy as jnp

z = np.load("/tmp/gather_tables.npz")
cols = jnp.asarray(z["cols16"])
n_vb, K = cols.shape
bu, D = 16, 2
C = K * bu
rng = np.random.default_rng(0)
vals = jnp.asarray(rng.standard_normal((n_vb, K, bu, bu)).astype(np.float32))
vals_rm = jnp.asarray(np.asarray(vals).transpose(0, 2, 1, 3).reshape(n_vb, bu, C))
x0 = jnp.asarray(rng.standard_normal((n_vb * bu, D)).astype(np.float32))

def timed(name, step, N=48, rep=3, extra=None):
    args = (x0, vals if extra is None else extra)
    def prog(x, v):
        def body(xc, _):
            y = step(xc, v)
            return y * 1e-3, None
        xc, _ = jax.lax.scan(body, x, None, length=N)
        return xc
    prog = jax.jit(prog)
    out = prog(*args); float(np.asarray(out).reshape(-1)[0])
    best = None
    for _ in range(rep):
        t0 = time.perf_counter()
        out = prog(*args); float(np.asarray(out).reshape(-1)[0])
        dt = (time.perf_counter() - t0) / N
        best = dt if best is None else min(best, dt)
    print(f"{name:56s} {best*1e3:8.3f} ms", flush=True)
    return out

# A: barrier + reshape-to-(K*bu,D) + dot_general with row-major vals
def mv_dg(x, v):
    xb = x.reshape(n_vb, bu * D)
    xg = jnp.take(xb, cols, axis=0, mode="clip")             # (n_vb,K,32)
    xg = jax.lax.optimization_barrier(xg)
    xg = xg.reshape(n_vb, K, bu, D).reshape(n_vb, C, D)
    y = jax.lax.dot_general(v, xg, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    return y.reshape(-1, D)
timed("barrier flat gather + dot_general rowmajor", mv_dg, extra=vals_rm)

# B: barrier on reshaped xg (materialize AFTER reshape)
def mv_dg2(x, v):
    xb = x.reshape(n_vb, bu * D)
    xg = jnp.take(xb, cols, axis=0, mode="clip")
    xg = xg.reshape(n_vb, K, bu, D).reshape(n_vb, C, D)
    xg = jax.lax.optimization_barrier(xg)
    y = jax.lax.dot_general(v, xg, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    return y.reshape(-1, D)
timed("flat gather + reshape + barrier + dot_general", mv_dg2, extra=vals_rm)

# C: barrier + mult-reduce (repeat of yesterday for variance check)
def mv_mr(x, v):
    xb = x.reshape(n_vb, bu * D)
    xg = jnp.take(xb, cols, axis=0, mode="clip")
    xg = jax.lax.optimization_barrier(xg)
    xg = xg.reshape(n_vb, K, bu, D)
    return (v[..., None] * xg[:, :, None]).sum(axis=(1, 3)).reshape(-1, D)
timed("barrier flat gather + mult-reduce", mv_mr)

# D: gather-only with barrier (isolate)
def mv_gonly(x, v):
    xb = x.reshape(n_vb, bu * D)
    xg = jnp.take(xb, cols, axis=0, mode="clip")
    xg = jax.lax.optimization_barrier(xg)
    return xg.sum(axis=1)[:, :D] + x[:n_vb] * 0
def prog_g(x):
    def body(xc, _):
        y = mv_gonly(xc, None)
        return jnp.tile(y, (bu, 1)) * 1e-3, None   # restore carry shape
    xc, _ = jax.lax.scan(body, x, None, length=48)
    return xc
pg = jax.jit(prog_g)
o = pg(x0); float(np.asarray(o).reshape(-1)[0])
best = None
for _ in range(3):
    t0 = time.perf_counter(); o = pg(x0); float(np.asarray(o).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / 48
    best = dt if best is None else min(best, dt)
print(f"{'barrier flat gather only (+tile restore)':56s} {best*1e3:8.3f} ms")

# E: correctness of A vs current
def mv_cur(x, v):
    xb = x.reshape(n_vb, bu, D)
    xg = jnp.take(xb, cols, axis=0, mode="clip")
    return (v[..., None] * xg[:, :, None]).sum(axis=(1, 3)).reshape(-1, D)
y_ref = jax.jit(mv_cur)(x0, vals)
y_a = jax.jit(mv_dg)(x0, vals_rm)
print("dg err:", float(jnp.abs(y_ref - y_a).max()))

# F: mass as BSR blocked apply (same as C but fresh vals) — per-step op now
timed("blocked mass apply (= C shape)", mv_mr)

# G: 64-wide two-block gather: gather pairs of adjacent 16-blocks?
# (cols16 values often adjacent) -- skip

# H: dot_general WITHOUT barrier (fused gather) for reference
def mv_dg_nb(x, v):
    xb = x.reshape(n_vb, bu * D)
    xg = jnp.take(xb, cols, axis=0, mode="clip")
    xg = xg.reshape(n_vb, K, bu, D).reshape(n_vb, C, D)
    y = jax.lax.dot_general(v, xg, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    return y.reshape(-1, D)
timed("flat gather + dot_general (no barrier)", mv_dg_nb, extra=vals_rm)
