"""3D block-value layout probe (VERDICT item 2).

2D (n_vb, K, 16, 16) F-values are HBM-resident at ~1x their logical
size, but the same shapes in the 3D apply measure ~8x (OOM above ~500k
DoF).  This probe measures, at representative 3D sizes:

  1. actual HBM bytes for the (n_vb, K, 16, 16) values + (n_vb, K, 16, 3)
     gathered operand under the production apply_f contraction,
  2. the same under candidate re-layouts:
       a. values stored (n_vb*K, 256), reshaped in-jit,
       b. dot_general (MXU) formulation with HIGHEST precision,
       c. d-major gathered operand (n_vb, K, 3, 16),
  3. wall time per apply.

Uses device memory_stats when the backend exposes them; falls back to
differential allocation probing.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

dev = jax.devices()[0]


def hbm_used():
    try:
        s = dev.memory_stats()
        return s.get("bytes_in_use", 0)
    except Exception:
        return -1


def bench(fn, *args, n=20):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


# representative 3D size: ~500k velocity DoF, bu=16
n_vb, K, bu, d = 12_000, 24, 16, 3
rng = np.random.default_rng(0)
print(f"n_vb={n_vb} K={K} bu={bu} d={d}  logical values "
      f"{n_vb*K*bu*bu*4/1e6:.0f} MB, x {n_vb*bu*d*4/1e6:.1f} MB", flush=True)

cols_h = rng.integers(0, n_vb, (n_vb, K)).astype(np.int32)
vals_h = rng.standard_normal((n_vb, K, bu, bu)).astype(np.float32)
x_h = rng.standard_normal((n_vb, bu, d)).astype(np.float32)

m0 = hbm_used()
cols = jnp.asarray(cols_h)
vals = jnp.asarray(vals_h)
x = jnp.asarray(x_h)
jax.block_until_ready((cols, vals, x))
m1 = hbm_used()
print(f"HBM after upload: +{(m1-m0)/1e6:.0f} MB "
      f"(logical {(vals_h.nbytes + x_h.nbytes + cols_h.nbytes)/1e6:.0f})",
      flush=True)


@jax.jit
def apply_prod(vals, cols, x):
    xg = jnp.take(x, cols, axis=0, mode="clip")          # (n_vb,K,bu,d)
    return (vals[..., None] * xg[:, :, None]).sum(axis=(1, 3))


r = apply_prod(vals, cols, x)
jax.block_until_ready(r)
m2 = hbm_used()
t = bench(apply_prod, vals, cols, x)
print(f"[prod 4d]   {t*1e3:7.2f} ms   HBM now +{(m2-m0)/1e6:.0f} MB",
      flush=True)

# candidate a: flat (n_vb*K, 256) storage, reshape in-jit
vals_flat = jnp.asarray(vals_h.reshape(n_vb * K, bu * bu))
jax.block_until_ready(vals_flat)
m3 = hbm_used()
print(f"flat upload: +{(m3-m2)/1e6:.0f} MB "
      f"(logical {vals_h.nbytes/1e6:.0f})", flush=True)


@jax.jit
def apply_flat(vf, cols, x):
    xg = jnp.take(x, cols, axis=0, mode="clip")
    v = vf.reshape(n_vb, K, bu, bu)
    return (v[..., None] * xg[:, :, None]).sum(axis=(1, 3))


r2 = apply_flat(vals_flat, cols, x)
jax.block_until_ready(r2)
t = bench(apply_flat, vals_flat, cols, x)
err = float(jnp.abs(r2 - r).max())
print(f"[flat+rs]   {t*1e3:7.2f} ms   err {err:.1e}   "
      f"HBM now +{(hbm_used()-m0)/1e6:.0f} MB", flush=True)


# candidate b: dot_general on MXU, HIGHEST precision
@jax.jit
def apply_dg(vals, cols, x):
    xg = jnp.take(x, cols, axis=0, mode="clip")          # (n_vb,K,bu,d)
    f2 = vals.transpose(0, 2, 1, 3).reshape(n_vb, bu, K * bu)
    x2 = xg.reshape(n_vb, K * bu, d)
    return jax.lax.dot_general(
        f2, x2, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST)


r3 = apply_dg(vals, cols, x)
jax.block_until_ready(r3)
t = bench(apply_dg, vals, cols, x)
err = float(jnp.abs(r3 - r).max())
print(f"[dot_gen]   {t*1e3:7.2f} ms   err {err:.1e}   "
      f"HBM now +{(hbm_used()-m0)/1e6:.0f} MB", flush=True)


# candidate c: d-major gather operand (put d on sublanes, bu on lanes)
@jax.jit
def apply_dmaj(vals, cols, x_dm):
    # x_dm: (n_vb, d, bu)
    xg = jnp.take(x_dm, cols, axis=0, mode="clip")       # (n_vb,K,d,bu)
    return jnp.einsum("rkij,rkdj->rid", vals, xg)


x_dm = jnp.asarray(x_h.transpose(0, 2, 1).copy())
r4 = apply_dmaj(vals, cols, x_dm)
jax.block_until_ready(r4)
t = bench(apply_dmaj, vals, cols, x_dm)
err = float(jnp.abs(r4 - r).max())
print(f"[d-major]   {t*1e3:7.2f} ms   err {err:.1e}   "
      f"HBM now +{(hbm_used()-m0)/1e6:.0f} MB", flush=True)

# 2D control at matched logical bytes: does the SAME apply in d=2 pad?
d2 = 2
x2_h = rng.standard_normal((n_vb, bu, d2)).astype(np.float32)
x2 = jnp.asarray(x2_h)


@jax.jit
def apply_prod2(vals, cols, x):
    xg = jnp.take(x, cols, axis=0, mode="clip")
    return (vals[..., None] * xg[:, :, None]).sum(axis=(1, 3))


r5 = apply_prod2(vals, cols, x2)
jax.block_until_ready(r5)
t = bench(apply_prod2, vals, cols, x2)
print(f"[prod d=2]  {t*1e3:7.2f} ms   HBM now +{(hbm_used()-m0)/1e6:.0f} MB",
      flush=True)
print("memory_stats available:", hbm_used() != -1, flush=True)
