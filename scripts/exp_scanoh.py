"""Calibrate per-iteration overhead of lax.scan/while_loop on this chip."""
import time
import numpy as np
import jax
import jax.numpy as jnp

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
    print(f"{name:52s} {best*1e3:8.4f} ms/iter", flush=True)

for sz, label in ((8, "tiny 8"), (45056, "45k"), (901120, "901k (3.6MB)")):
    x = jnp.asarray(rng.standard_normal(sz).astype(np.float32))
    def prog(x):
        def body(c, _):
            return c * 1.0000001, None
        c, _ = jax.lax.scan(body, x, None, length=400)
        return c
    timed(f"scan x400 trivial mul, carry {label}", prog, (x,), 400)

# while_loop version
x = jnp.asarray(rng.standard_normal(901120).astype(np.float32))
def prog_w(x):
    def cond(c):
        i, v = c
        return i < 400
    def body(c):
        i, v = c
        return i + 1, v * 1.0000001
    _, v = jax.lax.while_loop(cond, body, (0, x))
    return v
timed("while_loop x400 trivial mul, carry 3.6MB", prog_w, (x,), 400)

# unrolled 8 ops per scan iteration (amortization check)
def prog_u(x):
    def body(c, _):
        for _ in range(8):
            c = c * 1.0000001 + 1e-37
        return c, None
    c, _ = jax.lax.scan(body, x, None, length=400)
    return c
timed("scan x400 with 8 fused muls (per mul)", prog_u, (x,), 400*8)

# unrolled big work: 461MB read per iteration, N small
big = jnp.asarray(rng.standard_normal(115 * 1024 * 1024).astype(np.float32))
def prog_b(x, big):
    def body(c, _):
        return c * (1.0 + jnp.sum(jnp.abs(big + c[0])) * 1e-37), None
    c, _ = jax.lax.scan(body, x, None, length=64)
    return c
timed("scan x64 461MB abs-sum (expect ~0.9+oh)", prog_b, (x, big), 64)
