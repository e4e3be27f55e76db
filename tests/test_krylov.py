"""Krylov solver fixtures: SPD and nonsymmetric systems, preconditioning,
pytree inputs, saddle-point system with the aSIMPLE preconditioner."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navierstokes_tpu.solvers.krylov import cg, fgmres, gmres
from navierstokes_tpu.solvers.preconditioners import (InnerSolve,
                                                      make_asimple)


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((n, n))
    return Q @ Q.T + n * np.eye(n)


def test_cg_spd():
    n = 60
    A = jnp.asarray(_spd(n))
    b = jnp.asarray(np.random.default_rng(1).standard_normal(n))
    res = cg(lambda x: A @ x, b, tol=1e-10, maxiter=200)
    np.testing.assert_allclose(np.asarray(A @ res.x), np.asarray(b),
                               rtol=1e-8, atol=1e-8)
    assert bool(res.converged)


def test_gmres_nonsymmetric():
    n = 80
    rng = np.random.default_rng(2)
    A = np.eye(n) * 4 + rng.standard_normal((n, n)) * 0.3
    b = rng.standard_normal(n)
    res = gmres(lambda x: jnp.asarray(A) @ x, jnp.asarray(b), tol=1e-10,
                restart=40, maxiter=200)
    np.testing.assert_allclose(np.asarray(A @ np.asarray(res.x)), b,
                               rtol=1e-8, atol=1e-8)


def test_gmres_restarts_and_x0():
    n = 100
    rng = np.random.default_rng(3)
    A = np.eye(n) * 3 + rng.standard_normal((n, n)) * 0.2
    x_true = rng.standard_normal(n)
    b = A @ x_true
    # tiny restart forces several cycles
    res = gmres(lambda x: jnp.asarray(A) @ x, jnp.asarray(b),
                x0=jnp.asarray(x_true + 0.01 * rng.standard_normal(n)),
                tol=1e-12, restart=10, maxiter=300)
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-7, atol=1e-7)


def test_gmres_pytree_and_precond():
    n = 50
    rng = np.random.default_rng(4)
    d1 = 1.0 + rng.random(n) * 9
    d2 = 1.0 + rng.random(n) * 9

    def mv(x):
        return {"a": d1 * x["a"], "b": d2 * x["b"]}

    b = {"a": jnp.asarray(rng.standard_normal(n)),
         "b": jnp.asarray(rng.standard_normal(n))}
    M = lambda r: {"a": r["a"] / d1, "b": r["b"] / d2}
    res = gmres(mv, b, tol=1e-12, restart=5, maxiter=50, precond=M)
    np.testing.assert_allclose(np.asarray(res.x["a"]),
                               np.asarray(b["a"]) / d1, rtol=1e-9)
    assert int(res.iterations) <= 3  # perfectly preconditioned


def test_gmres_under_jit():
    n = 40
    rng = np.random.default_rng(5)
    A = jnp.asarray(np.eye(n) * 2 + rng.standard_normal((n, n)) * 0.1)
    b = jnp.asarray(rng.standard_normal(n))

    @jax.jit
    def solve(b):
        return gmres(lambda x: A @ x, b, tol=1e-10, restart=30, maxiter=60).x

    x = solve(b)
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), rtol=1e-8,
                               atol=1e-8)


def test_fgmres_saddle_point_asimple():
    """Small dense saddle-point system [F Bt; B 0] solved by FGMRES with the
    aSIMPLE preconditioner — the structure of the full NS step."""
    nu_, np_ = 60, 20
    rng = np.random.default_rng(6)
    F = _spd(nu_, 7) / nu_ + np.eye(nu_) * 2
    F += rng.standard_normal((nu_, nu_)) * 0.05  # mildly nonsymmetric
    B = rng.standard_normal((np_, nu_))

    Fj, Bj = jnp.asarray(F), jnp.asarray(B)

    def matvec(x):
        u, p = x
        return (Fj @ u + Bj.T @ p, Bj @ u)

    dinv = jnp.asarray(1.0 / np.diag(F))
    diag_s = jnp.asarray(np.einsum("ju,u,ju->j", B, 1.0 / np.diag(F), B))
    M = make_asimple(lambda u: Fj @ u, lambda u: Bj @ u,
                     lambda p: Bj.T @ p, dinv, diag_s, alpha=0.5,
                     inner_f=InnerSolve(1e-2, 40),
                     inner_s=InnerSolve(1e-2, 40))

    b = (jnp.asarray(rng.standard_normal(nu_)),
         jnp.asarray(rng.standard_normal(np_)))
    res = fgmres(matvec, b, tol=1e-9, restart=40, maxiter=200, precond=M)
    u, p = res.x
    ru = np.asarray(Fj @ u + Bj.T @ p) - np.asarray(b[0])
    rp = np.asarray(Bj @ u) - np.asarray(b[1])
    bn = np.linalg.norm(np.concatenate([np.asarray(b[0]), np.asarray(b[1])]))
    assert np.sqrt((ru ** 2).sum() + (rp ** 2).sum()) <= 1e-8 * bn * 10
    assert bool(res.converged)
