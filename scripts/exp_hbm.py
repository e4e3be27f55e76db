"""Honest HBM bandwidth probe for the axon-tunneled v5e.

Method: each op is repeated N times inside ONE jitted lax.scan with a
data dependency between iterations (so nothing can be hoisted or
memoized), fenced by a single scalar pull.  Wall time of the program
divided by N = per-op time.  This mirrors how the real solver runs
(chunked scans), which is the only timing the axon tunnel reports
faithfully (microbench pitfalls: see memory/axon-tpu-environment).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
MB = 461
n = MB * 1024 * 1024 // 4
buf = jnp.asarray(rng.standard_normal(n).astype(np.float32))

def timed(name, make_prog, bytes_per, N=64, rep=2):
    prog = jax.jit(make_prog(N))
    out = prog(buf)
    float(np.asarray(out).reshape(-1)[0])  # compile + exec fence
    best = None
    for _ in range(rep):
        t0 = time.perf_counter()
        out = prog(buf)
        float(np.asarray(out).reshape(-1)[0])
        dt = (time.perf_counter() - t0) / N
        best = dt if best is None else min(best, dt)
    print(f"{name:44s} {best*1e3:8.3f} ms  {bytes_per/best/1e9:7.1f} GB/s",
          flush=True)

# 1. read-only: sum(abs(vals + c)) — not factorable, full read each iter
def mk_read(N):
    def prog(v):
        def body(c, _):
            return jnp.sum(jnp.abs(v + c)) * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N)
        return c
    return prog
timed("read 461MB (sum abs)", mk_read, MB*1e6)

# 2. read+write: carry the full buffer
def mk_scale(N):
    def prog(v):
        def body(x, _):
            return x * 1.0000001 + 1e-30, None
        x, _ = jax.lax.scan(body, v, None, length=N)
        return x[:1]
    return prog
timed("scale 461MB (read+write)", mk_scale, 2*MB*1e6)

# 3. BJ dot_general rhs=2, chained through rb
n_t = n // (256*256)
def mk_bj_dg(N):
    A = buf  # closed over? no — pass as arg
    def prog(v):
        A = v[:n_t*256*256].reshape(n_t, 256, 256)
        rb0 = A[:, :, :2] * 1.0
        def body(rb, _):
            y = jax.lax.dot_general(A, rb, (((2,),(1,)),((0,),(0,))),
                                    preferred_element_type=jnp.float32)
            return y * 1e-3, None
        rb, _ = jax.lax.scan(body, rb0, None, length=N)
        return rb[0, 0]
    return prog
timed("BJ dot_general (nt,256,256)@(nt,256,2)", mk_bj_dg, MB*1e6)

# 4. BJ as VPU mult-reduce d=2
def mk_bj_mr(N):
    def prog(v):
        A = v[:n_t*256*256].reshape(n_t, 256, 256)
        rb0 = A[:, :2, :] * 1.0           # (n_t, 2, 256) planar
        def body(rb, _):
            y = (A[:, None, :, :] * rb[:, :, None, :]).sum(axis=3)
            return y * 1e-3, None
        rb, _ = jax.lax.scan(body, rb0, None, length=N)
        return rb[0, 0]
    return prog
timed("BJ mult-reduce planar (nt,2,256)", mk_bj_mr, MB*1e6)

# 5. F matvec mult-reduce with real cols
z = np.load("/tmp/fused_graph.npz")
cols_h = jnp.asarray(z["cols16"])
n_vb, K = z["cols16"].shape
bu, D = 16, 2
def mk_fmv(N):
    def prog(v):
        vals = v[:n_vb*K*bu*bu].reshape(n_vb, K, bu, bu)
        x0 = v[:n_vb*bu*D].reshape(n_vb*bu, D) * 1e-3
        def body(x, _):
            xb = x.reshape(n_vb, bu, D)
            xg = jnp.take(xb, cols_h, axis=0, mode="clip")
            y = (vals[..., None] * xg[:, :, None]).sum(axis=(1, 3))
            return y.reshape(-1, D) * 1e-3, None
        x, _ = jax.lax.scan(body, x0, None, length=N)
        return x[0]
    return prog
timed(f"F matvec mult-reduce ({n_vb}x{K} blocks)", mk_fmv, MB*1e6)

# 6. gather + cheap reduce (isolates gather cost)
def mk_gather(N):
    def prog(v):
        x0 = v[:n_vb*bu*D].reshape(n_vb*bu, D) * 1e-3
        def body(x, _):
            xb = x.reshape(n_vb, bu, D)
            xg = jnp.take(xb, cols_h, axis=0, mode="clip")
            y = xg.sum(axis=1)
            return y.reshape(-1, D) * 1e-3, None
        x, _ = jax.lax.scan(body, x0, None, length=N)
        return x[0]
    return prog
timed("gather+sum only (57.7MB)", mk_gather, 57.7e6)

# 7. F matvec via dot_general per block row: (n_vb,bu,K*bu)@(n_vb,K*bu,D)
def mk_fmv_dg(N):
    def prog(v):
        vals = v[:n_vb*K*bu*bu].reshape(n_vb, bu, K*bu)
        x0 = v[:n_vb*bu*D].reshape(n_vb*bu, D) * 1e-3
        def body(x, _):
            xb = x.reshape(n_vb, bu, D)
            xg = jnp.take(xb, cols_h, axis=0, mode="clip").reshape(n_vb, K*bu, D)
            y = jax.lax.dot_general(vals, xg, (((2,),(1,)),((0,),(0,))),
                                    preferred_element_type=jnp.float32)
            return y.reshape(-1, D) * 1e-3, None
        x, _ = jax.lax.scan(body, x0, None, length=N)
        return x[0]
    return prog
timed("F matvec dot_general", mk_fmv_dg, MB*1e6)
