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


def test_block_jacobi_scatter_matches_gather():
    """The round-5 "scatter" tile formulation (per-cell convection
    segment-sum + host static base — no gather, no lane-padded transient;
    the 3.39M-DoF 3D enabler) must produce bit-identical tiles to the
    gather formulations on a real cylinder mesh with real convection and
    BC masking."""
    import jax

    from navierstokes_tpu.mesh import channel_with_cylinder_2d
    from navierstokes_tpu.ops.operators import convection_matrices
    from navierstokes_tpu.ops.p1ell import (block_jacobi_tiles,
                                            static_tiles_host)

    mesh = channel_with_cylinder_2d(h=0.05, h_near=0.02)
    sp = TaylorHoodSpace(mesh)
    cells = cell_arrays_numpy(sp)
    bsr = B.build_bsr(sp, cells, row_multiple=128, static_device=False,
                      f_kmax=-1, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((sp.n_p2, 2)))
    a0_host = 150.0 * bsr.host_m_blk + 1e-3 * bsr.host_k_blk
    f_cell = jnp.asarray(a0_host) + B.convection_blk(bsr, u)
    mask = jnp.asarray((rng.random(sp.n_p2) > 0.1).astype(np.float64))
    sigma = jnp.asarray(3.7)
    ref = None
    for layout in ("rows", "blocked", "scatter"):
        plan = build_block_jacobi_plan(bsr, S=16, layout=layout,
                                       cell_p2_host=np.asarray(sp.cell_p2))
        if layout == "scatter":
            assert plan.con_row is not None and plan.seg is not None
            Cw = bsr.f_cols.shape[1] * bsr.bu
            t0 = jnp.asarray(
                static_tiles_host(plan, plan.host_idx, a0_host, Cw))
            c_elem = convection_matrices(bsr, bsr.t_hat, u)
            t = block_jacobi_tiles(plan, None, mask, sigma,
                                   c_elem=c_elem, tiles0=t0)
        else:
            t = block_jacobi_tiles(plan, f_cell, mask, sigma)
        t = np.asarray(t)
        if ref is None:
            ref = t
        else:
            err = np.abs(t - ref).max() / np.abs(ref).max()
            assert err < 1e-11, (layout, err)


def test_projection_step_scatter_tiles_end_to_end():
    """One projection step with bj_tiles='scatter' matches the 'blocked'
    gather formulation to solver tolerance (same preconditioner algebra,
    different assembly route)."""
    from navierstokes_tpu.mesh import channel_with_cylinder_2d
    from navierstokes_tpu.models.navier_stokes import NavierStokes

    mesh = channel_with_cylinder_2d(h=0.06, h_near=0.03)
    results = {}
    for layout in ("blocked", "scatter"):
        cfg = SolverConfig(dtype="float64", scheme="projection",
                           bj_tiles=layout,
                           output_dir="/tmp/bjsc/o", cache_dir="/tmp/bjsc/c",
                           csv_path="/tmp/bjsc/f.csv")
        inlet = InletConfig(kind="parabolic", u_m=1.5, height=0.41)
        ns = NavierStokes(mesh, 2, 1, deltat=0.01, T=0.05, step=0,
                          inlet=inlet, config=cfg)
        ns.set_re_number(100)
        ns.setup()
        assert ns._bj_plan.layout == layout
        ns._init_state(0)
        for _ in range(3):
            ns.solve_time_step()
        results[layout] = (np.asarray(ns._u), np.asarray(ns._p), ns.cd)
    du = np.abs(results["scatter"][0] - results["blocked"][0]).max()
    assert du < 1e-6, du
    assert abs(results["scatter"][2] - results["blocked"][2]) < 1e-5


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
