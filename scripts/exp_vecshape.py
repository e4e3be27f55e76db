"""Do (n,2) vectors pay a 64x lane-padding tax on materialized buffers?
Times axpy/dot at bench scale in (n,2) vs (n/16,32) vs flat (2n,) layouts.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

n = 450560
rng = np.random.default_rng(0)
a2 = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
b2 = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
a32 = a2.reshape(n // 16, 32)
b32 = b2.reshape(n // 16, 32)
af = a2.reshape(-1)
bf = b2.reshape(-1)

def timed(name, step, x, y, N=200, rep=3):
    def prog(x, y):
        def body(c, _):
            x, y = c
            x2 = step(x, y)
            return (x2, y), None
        (x, y), _ = jax.lax.scan(body, (x, y), None, length=N)
        return x
    prog = jax.jit(prog)
    out = prog(x, y); float(np.asarray(out).reshape(-1)[0])
    best = None
    for _ in range(rep):
        t0 = time.perf_counter()
        out = prog(x, y); float(np.asarray(out).reshape(-1)[0])
        dt = (time.perf_counter() - t0) / N
        best = dt if best is None else min(best, dt)
    print(f"{name:44s} {best*1e3:8.4f} ms", flush=True)

axpy = lambda x, y: x + 0.5 * y
timed("axpy (n,2)", axpy, a2, b2)
timed("axpy (n/16,32)", axpy, a32, b32)
timed("axpy flat (2n,)", axpy, af, bf)

# dot: returns scalar; chain via scaling x
def dot2(x, y):
    s = jnp.vdot(x.reshape(-1), y.reshape(-1))
    return x * (1.0 + s * 1e-30)
timed("dot (n,2)", dot2, a2, b2)
timed("dot (n/16,32)", dot2, a32, b32)
timed("dot flat", dot2, af, bf)

# 7-vector BiCGStab-ish iteration of pure vector work
def vec7(x, y):
    p = x + 0.5 * y
    v = p * 1.1
    s = x - 0.3 * v
    t = s * 0.9
    w1 = jnp.vdot(t.reshape(-1), s.reshape(-1))
    w2 = jnp.vdot(t.reshape(-1), t.reshape(-1))
    x2 = x + (w1 / (w2 + 1.0)) * p + 0.1 * s
    return x2
timed("7-op vec iteration (n,2)", vec7, a2, b2)
timed("7-op vec iteration (n/16,32)", vec7, a32, b32)

# layout conversion cost
def conv(x, y):
    z = x.reshape(n // 16, 32) + 0.0
    return z.reshape(n, 2) * 1.0000001
timed("(n,2)->(n/16,32)->(n,2) round trip", conv, a2, b2)
