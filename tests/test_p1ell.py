"""Host-assembled Ap and the block-Jacobi tile preconditioner vs the
matrix-free / dense ground truths."""

import jax.numpy as jnp
import numpy as np
import pytest

from navierstokes_tpu.config import InletConfig, SolverConfig
from navierstokes_tpu.fem.spaces import TaylorHoodSpace
from navierstokes_tpu.mesh import rectangle_2d
from navierstokes_tpu.ops import bsr as B
from navierstokes_tpu.ops.assembly import cell_arrays_numpy
from navierstokes_tpu.ops.p1ell import (assemble_ap, build_block_jacobi_plan,
                                        block_jacobi_apply,
                                        block_jacobi_inverse, coarse_from_ell,
                                        ell_matvec)


@pytest.fixture(scope="module")
def setup():
    mesh = rectangle_2d(nx=14, ny=10)
    mesh.reorder_spatial()
    sp = TaylorHoodSpace(mesh, 2, 1)
    cells = cell_arrays_numpy(sp)
    bsr = B.build_bsr(sp, cells, dtype=jnp.float64)
    return sp, cells, bsr


def test_assembled_ap_matches_matrix_free(setup):
    sp, cells, bsr = setup
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.uniform(0.5, 2.0, sp.n_p2))
    ap = assemble_ap(sp, cells, np.asarray(w), jnp.float64)
    v = jnp.asarray(rng.standard_normal(sp.n_p1))
    y_ell = ell_matvec(ap, v)
    y_mf = B.apply_b(bsr, B.apply_bt(bsr, v) * w[:, None])
    assert np.allclose(np.asarray(y_ell), np.asarray(y_mf), atol=1e-10)
    # diagonal parity
    d_mf = B.schur_diag(bsr, w)
    assert np.allclose(np.asarray(ap.diag), np.asarray(d_mf), atol=1e-10)


def test_coarse_from_ell(setup):
    sp, cells, bsr = setup
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.uniform(0.5, 2.0, sp.n_p2))
    ap = assemble_ap(sp, cells, np.asarray(w), jnp.float64)
    agg = 4
    sc = coarse_from_ell(ap, agg)
    # brute force: R^T Ap R with R = aggregate indicator
    n_b = ap.cols.shape[0]
    n_agg = -(-n_b // agg)
    n = sp.n_p1
    Apd = np.zeros((n, n))
    for i in range(n):
        e = np.zeros(n)
        e[i] = 1.0
        Apd[:, i] = np.asarray(ell_matvec(ap, jnp.asarray(e)))
    R = np.zeros((n, n_agg))
    R[np.arange(n), np.arange(n) // (agg * ap.b)] = 1.0
    assert np.allclose(sc, R.T @ Apd @ R, atol=1e-9)


@pytest.mark.parametrize("layout", ["blocked", "rows"])
def test_block_jacobi_inverse(setup, layout):
    sp, cells, bsr = setup
    rng = np.random.default_rng(2)
    f_blk = bsr.m_blk + 0.05 * bsr.k_blk
    mask = (rng.uniform(size=sp.n_p2) > 0.1).astype(np.float64)
    sigma = 3.7
    plan = build_block_jacobi_plan(bsr, S=2, layout=layout)
    assert plan.layout == layout
    inv = block_jacobi_inverse(plan, f_blk, jnp.asarray(mask), sigma)

    # dense ground truth of one tile (flat row-major values: ops/bsr.py)
    n_vb, bu, C = f_blk.shape
    KB = C // bu
    Fd = np.zeros((sp.n_p2, sp.n_p2))
    fb = np.asarray(f_blk).reshape(n_vb, bu, KB, bu).transpose(0, 2, 1, 3)
    cols = np.asarray(bsr.f_cols)
    for r in range(n_vb):
        for kk in range(KB):
            c = cols[r, kk]
            blk = fb[r, kk]
            for a in range(bu):
                i = r * bu + a
                if i >= sp.n_p2:
                    continue
                for b2 in range(bu):
                    j = c * bu + b2
                    if j < sp.n_p2:
                        Fd[i, j] += blk[a, b2]
    Fm = Fd * mask[:, None] * mask[None, :]
    Fm[np.arange(sp.n_p2), np.arange(sp.n_p2)] += sigma * (1 - mask)
    TS = plan.S * bu
    for t in (0, 1):
        lo, hi = t * TS, min((t + 1) * TS, sp.n_p2)
        tile = np.zeros((TS, TS))
        tile[:hi - lo, :hi - lo] = Fm[lo:hi, lo:hi]
        tile[np.arange(hi - lo, TS), np.arange(hi - lo, TS)] = sigma
        got = np.asarray(inv)[t]
        assert np.allclose(got @ tile, np.eye(TS), atol=1e-4)

    # apply parity
    r = rng.standard_normal((sp.n_p2, 2))
    y = block_jacobi_apply(plan, inv, jnp.asarray(r))
    # block-diag solve reference
    y_ref = np.zeros_like(r)
    for t in range(plan.n_tiles):
        lo, hi = t * TS, min((t + 1) * TS, sp.n_p2)
        tile = Fm[lo:hi, lo:hi]
        y_ref[lo:hi] = np.linalg.solve(tile, r[lo:hi])
    assert np.allclose(np.asarray(y), y_ref, atol=1e-4)
