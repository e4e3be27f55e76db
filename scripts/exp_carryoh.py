"""How does lax.scan/while_loop per-iteration overhead scale with carry size?

A Krylov iteration carries ~10 vectors of ~3.6MB; if overhead is ~0.1 ms/MB
of carry, the solver pays ~3.5 ms/iter before any math. Measures:
  - k separate 3.6MB carries, trivial update of ONE of them
  - one fused (k*3.6MB) carry
  - update ALL carries vs one
  - while_loop variant
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

n = 901120
rng = np.random.default_rng(0)


def timed(name, prog, args, N, rep=3):
    prog = jax.jit(prog)
    out = prog(*args); float(np.asarray(out).reshape(-1)[0])
    best = None
    for _ in range(rep):
        t0 = time.perf_counter()
        out = prog(*args); float(np.asarray(out).reshape(-1)[0])
        dt = (time.perf_counter() - t0) / N
        best = dt if best is None else min(best, dt)
    print(f"{name:56s} {best*1e3:8.4f} ms/iter", flush=True)


for k in (1, 2, 4, 8, 12):
    vecs = tuple(jnp.asarray(rng.standard_normal(n).astype(np.float32)) for _ in range(k))

    def prog_one(*vs):
        def body(c, _):
            return (c[0] * 1.0000001,) + c[1:], None
        c, _ = jax.lax.scan(body, vs, None, length=200)
        return c[0]
    timed(f"scan: {k}x3.6MB carries, update 1", prog_one, vecs, 200)

    def prog_all(*vs):
        def body(c, _):
            return tuple(v * 1.0000001 for v in c), None
        c, _ = jax.lax.scan(body, vs, None, length=200)
        return c[0]
    timed(f"scan: {k}x3.6MB carries, update all", prog_all, vecs, 200)

# one fused 12x buffer, update one slice vs all
big = jnp.asarray(rng.standard_normal((12, n)).astype(np.float32))
def prog_fused_one(b):
    def body(c, _):
        return c.at[0].multiply(1.0000001), None
    c, _ = jax.lax.scan(body, b, None, length=200)
    return c[0]
timed("scan: fused (12,n) carry, update row 0 via .at", prog_fused_one, (big,), 200)

def prog_fused_all(b):
    def body(c, _):
        return c * 1.0000001, None
    c, _ = jax.lax.scan(body, b, None, length=200)
    return c[0]
timed("scan: fused (12,n) carry, update all", prog_fused_all, (big,), 200)

# while_loop with 8 carries, update 1
vecs8 = tuple(jnp.asarray(rng.standard_normal(n).astype(np.float32)) for _ in range(8))
def prog_w(*vs):
    def cond(c):
        return c[0] < 200
    def body(c):
        i, rest = c[0], c[1:]
        return (i + 1, rest[0] * 1.0000001) + rest[1:]
    c = jax.lax.while_loop(cond, body, (0,) + vs)
    return c[1]
timed("while: 8x3.6MB carries, update 1", prog_w, vecs8, 200)
