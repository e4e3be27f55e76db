"""Unit tests for quadrature rules and reference-element tables.

The reference has no unit tests (SURVEY.md par.4); these validate the FE
core against exact integrals the way deal.II's own test suite would.
"""

import math

import numpy as np
import pytest

from navierstokes_tpu.fem.quadrature import gauss_simplex
from navierstokes_tpu.fem.reference_elements import (
    ReferenceSimplex, edges_of, p2_node_ref_coords, shape_grads, shape_values)


def _exact_monomial_simplex(dim, exps):
    """int_simplex x1^a1 ... = prod(ai!) / (sum(ai) + dim)!"""
    num = 1.0
    for a in exps:
        num *= math.factorial(a)
    return num / math.factorial(sum(exps) + dim)


@pytest.mark.parametrize("dim", [1, 2, 3])
@pytest.mark.parametrize("n", [1, 2, 3, 4])
def test_gauss_simplex_exactness(dim, n):
    pts, w = gauss_simplex(dim, n)
    deg = 2 * n - 1
    # all monomials up to the rule's guaranteed degree
    from itertools import product
    for exps in product(range(deg + 1), repeat=dim):
        if sum(exps) > deg:
            continue
        vals = np.ones(len(pts))
        for d, a in enumerate(exps):
            vals *= pts[:, d] ** a
        exact = _exact_monomial_simplex(dim, exps)
        assert abs(w @ vals - exact) < 1e-13, (dim, n, exps)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("degree", [1, 2])
def test_partition_of_unity(dim, degree):
    rng = np.random.default_rng(0)
    # random points in the simplex
    p = rng.random((50, dim))
    p = p / np.maximum(p.sum(axis=1, keepdims=True), 1.0)
    vals = shape_values(dim, degree, p)
    np.testing.assert_allclose(vals.sum(axis=1), 1.0, atol=1e-13)
    grads = shape_grads(dim, degree, p)
    np.testing.assert_allclose(grads.sum(axis=1), 0.0, atol=1e-13)


@pytest.mark.parametrize("dim", [2, 3])
def test_p2_nodal_basis(dim):
    """phi_i(node_j) = delta_ij at the P2 nodes."""
    nodes = p2_node_ref_coords(dim)
    vals = shape_values(dim, 2, nodes)
    np.testing.assert_allclose(vals, np.eye(len(nodes)), atol=1e-13)


@pytest.mark.parametrize("dim", [2, 3])
def test_p2_reproduces_quadratics(dim):
    """P2 interpolation of a quadratic is exact, including gradients."""
    rng = np.random.default_rng(1)
    A = rng.random((dim, dim))
    A = A + A.T
    b = rng.random(dim)

    def f(x):
        return np.einsum("nd,de,ne->n", x, A, x) + x @ b + 0.7

    def grad_f(x):
        return 2 * x @ A + b

    nodes = p2_node_ref_coords(dim)
    coef = f(nodes)
    p = rng.random((20, dim))
    p = p / np.maximum(p.sum(axis=1, keepdims=True) + 0.2, 1.0)
    vals = shape_values(dim, 2, p) @ coef
    np.testing.assert_allclose(vals, f(p), atol=1e-12)
    grads = np.einsum("qad,a->qd", shape_grads(dim, 2, p), coef)
    np.testing.assert_allclose(grads, grad_f(p), atol=1e-12)


@pytest.mark.parametrize("dim", [2, 3])
def test_reference_tensors(dim):
    """Hand-check a few entries of the precomputed assembly tensors."""
    rs = ReferenceSimplex(dim)
    # mass matrix row sums = integral of each phi over the simplex;
    # total sum = measure of the simplex
    measure = 0.5 if dim == 2 else 1.0 / 6.0
    np.testing.assert_allclose(rs.M_hat.sum(), measure, atol=1e-13)
    # stiffness: K contracted with identity on a gradient of a linear
    # function: sum_ab K[x,y,a,b] c_a c_b with c = nodal values of x1 gives
    # int |d x1|^2 = measure
    nodes = p2_node_ref_coords(dim)
    c = nodes[:, 0]
    val = np.einsum("xyab,a,b->xy", rs.K_hat, c, c)
    expect = np.zeros((dim, dim))
    expect[0, 0] = measure
    np.testing.assert_allclose(val, expect, atol=1e-13)
    # G: sum_a G[a,x,j] * 1_a = int d_x(1) psi_j = 0
    np.testing.assert_allclose(rs.G_hat.sum(axis=0), 0.0, atol=1e-13)
    # T: convection of constant field by constant basis = int phi_a d_x phi_b
    ones = np.ones(rs.n_v)
    t = np.einsum("abxe,e->abx", rs.T_hat, ones)
    g = np.einsum("q,qa,qbx->abx", rs.qw, rs.phi_v, rs.dphi_v)
    np.testing.assert_allclose(t, g, atol=1e-13)


@pytest.mark.parametrize("dim", [2, 3])
def test_facet_tables(dim):
    """Facet quadrature integrates facet measure; facet basis traces match."""
    rs = ReferenceSimplex(dim)
    # facet 0 of the triangle is (0,1): measure 1; of the tet (1,2,3):
    # measure sqrt(3)/2.
    w = rs.fqw
    if dim == 2:
        assert abs(w.sum() - 1.0) < 1e-13
    else:
        assert abs(w.sum() - 0.5) < 1e-13
    # partition of unity on facets
    np.testing.assert_allclose(rs.facet_phi_v.sum(axis=2), 1.0, atol=1e-13)
    np.testing.assert_allclose(rs.facet_phi_p.sum(axis=2), 1.0, atol=1e-13)
