"""XLA gather cost model on TPU: vary row count, row width, table size."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, n=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    return dt


def main():
    rng = np.random.default_rng(0)
    take = jax.jit(lambda tab, idx: jnp.take(tab, idx, axis=0))
    fuse = jax.jit(lambda tab, idx: jnp.take(tab, idx, axis=0).sum())
    print(f"{'table':>16} {'rows gathered':>14} {'row B':>6} "
          f"{'ms':>8} {'ns/row':>8} {'GB/s':>7}")
    for n_tab, width in [(28158, 32), (28158, 128), (28158, 512),
                         (450518, 8), (450518, 32), (112630, 128),
                         (7040, 512), (7040, 2048)]:
        tab = jnp.asarray(
            rng.standard_normal((n_tab, width // 4)), jnp.float32)
        for n_rows in (50_000, 200_000, 450_000):
            idx = jnp.asarray(rng.integers(0, n_tab, n_rows), jnp.int32)
            dt = timeit("t", take, tab, idx)
            print(f"{n_tab:>10}x{width//4:<5} {n_rows:>14} {width:>6} "
                  f"{dt*1e3:8.3f} {dt/n_rows*1e9:8.1f} "
                  f"{n_rows*width/dt/1e9:7.1f}", flush=True)


if __name__ == "__main__":
    main()
