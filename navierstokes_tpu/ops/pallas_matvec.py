"""Fused multi-component F matvec — Pallas TPU kernel.

The hot op of every Krylov iteration is the block-sparse F matvec
(ops/bsr.py apply_f; the SpMV inside the reference's solves,
/root/reference/src/NavierStokes.cpp:377, 978-989).  The XLA path
streams the flat row-major value array ``f_blk`` (the dominant HBM
traffic: ~0.3 GB in 2D at 1M DoF, ~0.9 GB in 3D at 1.5M DoF) once PER
VELOCITY COMPONENT, because each component's gathered operand is a
separate (n_ext, C) array and XLA fuses gather+multiply+reduce per
component.  This kernel reads each value tile from HBM ONCE and
contracts it against all ``dim`` pre-gathered operands from VMEM —
cutting the dominant traffic ~2x in 2D and ~3x in 3D.

Design notes (measured Mosaic constraints, scripts/exp_mosgather*.py):
  * ``jnp.take`` / gather does not lower inside Mosaic on this
    toolchain, so the column gather stays OUTSIDE the kernel (one XLA
    take per component, exactly as in apply_f); only the
    multiply-reduce is fused.  The gathered operands are (T, C) tiles —
    full 128-lane minor axis, no padding.
  * The whole velocity vector cannot sit in VMEM as (n, dim): Mosaic
    lane-pads the minor dim to 128 (64x).  Pre-gathering avoids any
    in-kernel dynamic indexing entirely.
  * Outputs are (T, bu) blocks of per-component (n_ext, bu) arrays —
    the same intermediate shape the XLA path produces before the
    component stack.
  * ``n_ext`` is always a multiple of ROW_TILE: build_bsr pads the
    overflow-row block (ops/bsr.py TILE) so the grid tiles exactly.

Enabled with ``SolverConfig.f_matvec = "pallas"`` (A/B-able against the
default XLA path; bit-compatible up to fp32 reduction order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row-block tile per grid step.  VMEM per step at C=256, bu=16, fp32:
# vals 64*16*256*4 = 4 MB  (double-buffered by Mosaic: 8 MB) — fits v5e
# VMEM with room for the operand tiles.  Must divide n_ext (build_bsr
# pads to a multiple of 64).
ROW_TILE = 64


def _kernel(vals_ref, *refs):
    # refs = (xg_0..xg_{d-1}, out_0..out_{d-1})
    d = len(refs) // 2
    v = vals_ref[...]                                   # (T, bu, C)
    if v.dtype == jnp.bfloat16:
        for dd in range(d):
            xg = refs[dd][...].astype(jnp.bfloat16)      # (T, C)
            prod = v * xg[:, None, :]
            refs[d + dd][...] = prod.astype(jnp.float32).sum(-1)
    else:
        for dd in range(d):
            xg = refs[dd][...]                           # (T, C)
            refs[d + dd][...] = (v * xg[:, None, :]).sum(-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_reduce(f_blk, xgs, interpret=False):
    """out[v, i, dd] = sum_c f_blk[v, i, c] * xgs[dd][v, c].

    f_blk: (n_ext, bu, C) fp32/bf16 with n_ext % ROW_TILE == 0 and C a
    multiple of 128; xgs: tuple of dim (n_ext, C) fp32 arrays.
    Returns (n_ext, bu, dim) fp32."""
    n_ext, bu, C = f_blk.shape
    d = len(xgs)
    T = ROW_TILE
    assert n_ext % T == 0, (n_ext, T)
    grid = (n_ext // T,)
    outs = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((T, bu, C), lambda i: (i, 0, 0))]
        + [pl.BlockSpec((T, C), lambda i: (i, 0)) for _ in range(d)],
        out_specs=[pl.BlockSpec((T, bu), lambda i: (i, 0))
                   for _ in range(d)],
        out_shape=[jax.ShapeDtypeStruct((n_ext, bu), jnp.float32)
                   for _ in range(d)],
        interpret=interpret,
    )(f_blk, *xgs)
    return jnp.stack(outs, axis=-1)


def apply_f_fused(bsr, f_blk, xu, interpret=False):
    """Drop-in replacement for ops.bsr.apply_f (same semantics): one
    HBM pass over the values for ALL velocity components."""
    from navierstokes_tpu.ops.bsr import _fold_overflow, _ublocks
    n_ext, bu, C = f_blk.shape
    d = xu.shape[1]
    xb = _ublocks(bsr, xu)
    xgs = tuple(
        jnp.take(xb[..., dd], bsr.f_cols, axis=0,
                 mode="clip").reshape(n_ext, C)
        for dd in range(d))
    y = fused_reduce(f_blk, xgs, interpret=interpret)   # (n_ext, bu, d)
    y = _fold_overflow(bsr, y)
    return y.reshape(-1, d)[:bsr.n_p2].astype(xu.dtype)
