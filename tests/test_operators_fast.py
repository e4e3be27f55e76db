"""Parity of the fast operator realizations (node-graph ELL, blocked BSR)
against the element gather/scatter formulation (itself validated against a
dense assembly oracle in test_assembly.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from navierstokes_tpu.fem.spaces import TaylorHoodSpace
from navierstokes_tpu.mesh import box_3d, channel_with_cylinder_2d
from navierstokes_tpu.mesh.geometry import morton_order
from navierstokes_tpu.ops import bsr as B
from navierstokes_tpu.ops import ell as E
from navierstokes_tpu.ops.assembly import build_cell_arrays, cell_arrays_numpy
from navierstokes_tpu.ops.operators import (apply_blocks, build_scatter,
                                            convection_matrices,
                                            f_diag as f_diag_cells,
                                            mass_apply as mass_cells)


@pytest.fixture(scope="module", params=[2, 3])
def problem(request):
    dim = request.param
    mesh = (channel_with_cylinder_2d(h=0.08).reorder_spatial() if dim == 2
            else box_3d(n=3).reorder_spatial())
    sp = TaylorHoodSpace(mesh)
    host = cell_arrays_numpy(sp)
    cells = build_cell_arrays(sp, dtype=jnp.float64, host=host)
    sv = build_scatter(sp.cell_p2, sp.n_p2)
    spp = build_scatter(sp.cell_p1, sp.n_p1)
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal((sp.n_p2, dim)))
    p = jnp.asarray(rng.standard_normal(sp.n_p1))
    t_hat = jnp.asarray(sp.rs.T_hat)
    fc = cells.mass / 0.05 + 0.3 * cells.stiff \
        + convection_matrices(cells, t_hat, u)
    yu_ref, yp_ref = apply_blocks(cells, fc, sv, spp, u, p)
    d_ref = f_diag_cells(cells, fc, sv)
    m_ref = mass_cells(cells, sv, u)
    return dict(sp=sp, host=host, cells=cells, u=u, p=p, fc=fc,
                yu=np.asarray(yu_ref), yp=np.asarray(yp_ref),
                d=np.asarray(d_ref), m=np.asarray(m_ref))


def test_ell_parity(problem):
    sp, u, p = problem["sp"], problem["u"], problem["p"]
    ell = E.build_ell(sp, problem["host"], dtype=jnp.float64)
    f_vals = ell.m_vals / 0.05 + 0.3 * ell.k_vals + E.convection_graph(ell, u)
    yu = E.apply_f(ell, f_vals, u) + E.apply_bt(ell, p)
    yp = E.apply_b(ell, u)
    np.testing.assert_allclose(np.asarray(yu), problem["yu"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(yp), problem["yp"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(E.f_diag(ell, f_vals)),
                               problem["d"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(E.mass_apply(ell, u)),
                               problem["m"], atol=1e-12)


def test_bsr_parity(problem):
    sp, u, p = problem["sp"], problem["u"], problem["p"]
    bsr = B.build_bsr(sp, problem["host"], dtype=jnp.float64)
    f_blk = bsr.m_blk / 0.05 + 0.3 * bsr.k_blk + B.convection_blk(bsr, u)
    yu = B.apply_f(bsr, f_blk, u) + B.apply_bt(bsr, p)
    yp = B.apply_b(bsr, u)
    np.testing.assert_allclose(np.asarray(yu), problem["yu"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(yp), problem["yp"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(B.f_diag(bsr, f_blk)),
                               problem["d"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(B.mass_apply(bsr, u)),
                               problem["m"], atol=1e-12)
    # exact Schur diagonal: compare BSR vs ELL (both assembled-exact)
    ell = E.build_ell(sp, problem["host"], dtype=jnp.float64)
    w = jnp.abs(u[:, 0]) + 0.1
    np.testing.assert_allclose(np.asarray(B.schur_diag(bsr, w)),
                               np.asarray(E.schur_diag(ell, w)), atol=1e-12)


def test_bsr_overflow_split_parity(problem):
    """The overflow-split table (f_kmax) must reproduce the unsplit BSR
    operator exactly: apply, diag, mass, and the block-Jacobi tiles."""
    from navierstokes_tpu.ops.p1ell import (block_jacobi_apply,
                                            block_jacobi_inverse,
                                            build_block_jacobi_plan)
    sp, u, p = problem["sp"], problem["u"], problem["p"]
    # small f_kmax forces spill on most rows (KB is ~10-30 on these meshes)
    bsr = B.build_bsr(sp, problem["host"], dtype=jnp.float64, f_kmax=5)
    assert bsr.ovf_rows is not None
    f_blk = bsr.m_blk / 0.05 + 0.3 * bsr.k_blk + B.convection_blk(bsr, u)
    yu = B.apply_f(bsr, f_blk, u)
    yu_ref = problem["yu"] - np.asarray(B.apply_bt(bsr, p))
    np.testing.assert_allclose(np.asarray(yu), yu_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(B.f_diag(bsr, f_blk)),
                               problem["d"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(B.mass_apply(bsr, u)),
                               problem["m"], atol=1e-12)
    # block-Jacobi tiles: split vs unsplit plans agree
    bsr0 = B.build_bsr(sp, problem["host"], dtype=jnp.float64)
    f0 = bsr0.m_blk / 0.05 + 0.3 * bsr0.k_blk + B.convection_blk(bsr0, u)
    mask = jnp.ones(sp.n_p2, jnp.float64)
    r = u
    for S in (4, 8):
        plan = build_block_jacobi_plan(bsr, S=S)
        plan0 = build_block_jacobi_plan(bsr0, S=S)
        t = block_jacobi_inverse(plan, f_blk, mask, 1.0)
        t0 = block_jacobi_inverse(plan0, f0, mask, 1.0)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t0),
                                   atol=1e-10)
        y = block_jacobi_apply(plan, t, r)
        y0 = block_jacobi_apply(plan0, t0, r)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y0),
                                   atol=1e-10)


def test_bsr_gb_split_parity(problem):
    """The G/B overflow split (gb_kmax=-1) must reproduce the unsplit
    pressure-coupling operators exactly: apply_bt, apply_b, schur_diag,
    and the df32 refine variants (per-row fold via the spill gather
    table, ops/bsr._fold_spills)."""
    from navierstokes_tpu.solvers.refine import apply_b_df, apply_bt_df
    sp, u, p = problem["sp"], problem["u"], problem["p"]
    bsr = B.build_bsr(sp, problem["host"], dtype=jnp.float64, gb_kmax=-1)
    # the auto K0 must actually split on these graphs or the test is
    # vacuous (fill ratios ~0.4-0.7 measured, scripts/exp_hbm_account.py)
    assert bsr.g_spill is not None or bsr.b_spill is not None
    gu = B.apply_bt(bsr, p)
    dv = B.apply_b(bsr, u)
    bsr0 = B.build_bsr(sp, problem["host"], dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(gu),
                               np.asarray(B.apply_bt(bsr0, p)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(dv),
                               np.asarray(B.apply_b(bsr0, u)), atol=1e-12)
    w = jnp.asarray(np.random.default_rng(3).random(sp.n_p2))
    np.testing.assert_allclose(np.asarray(B.schur_diag(bsr, w)),
                               np.asarray(B.schur_diag(bsr0, w)),
                               atol=1e-12)
    # df32 variants fold hi/lo through the same spill table
    z = jnp.zeros_like(p)
    zu = jnp.zeros_like(u)
    gh, gl = apply_bt_df(bsr, (p, z))
    g0h, g0l = apply_bt_df(bsr0, (p, z))
    np.testing.assert_allclose(np.asarray(gh + gl), np.asarray(g0h + g0l),
                               atol=1e-12)
    bh, bl = apply_b_df(bsr, (u, zu))
    b0h, b0l = apply_b_df(bsr0, (u, zu))
    np.testing.assert_allclose(np.asarray(bh + bl), np.asarray(b0h + b0l),
                               atol=1e-12)


def test_morton_order_locality():
    rng = np.random.default_rng(0)
    pts = rng.random((4096, 2))
    perm = morton_order(pts)
    sorted_pts = pts[perm]
    # consecutive points along the curve are spatially close on average
    d = np.linalg.norm(np.diff(sorted_pts, axis=0), axis=1)
    assert np.median(d) < 0.05  # ~1/sqrt(4096) scale
    # permutation property
    assert len(np.unique(perm)) == len(pts)
