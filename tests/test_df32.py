"""Unit tests for the double-float compensated arithmetic (ops/df32.py).

Each identity is checked against numpy float64 ground truth; tolerances
are set at the ~2^-45 level the two-float representation guarantees
(fp32 eps^2 ~ 1.4e-14 relative, with some slack for the tree sums)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from navierstokes_tpu.ops import df32


def test_two_sum_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(1000), jnp.float32)
    b = jnp.asarray(rng.standard_normal(1000) * 1e-6, jnp.float32)
    s, e = df32.two_sum(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    assert np.array_equal(got, exact)


def test_two_prod_exact():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal(1000), jnp.float32)
    b = jnp.asarray(rng.standard_normal(1000), jnp.float32)
    p, e = df32.two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    # fp32 products are exact in f64
    assert np.array_equal(got, exact)


def test_df_dot_cancellation():
    # a dot product that cancels to ~1e-7 of its magnitude: plain fp32
    # loses everything, df recovers ~14 digits
    rng = np.random.default_rng(2)
    n = 4096
    a64 = rng.standard_normal(n)
    b64 = rng.standard_normal(n)
    # force near-cancellation
    b64[n // 2:] = -(a64[:n // 2] * b64[:n // 2])[::-1] / a64[n // 2:]
    a = jnp.asarray(a64, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    exact = np.dot(np.asarray(a, np.float64), np.asarray(b, np.float64))
    hi, lo = jax.jit(df32.df_dot)(a, b)
    got = float(hi) + float(lo)
    scale = float(np.sum(np.abs(np.asarray(a, np.float64)
                                * np.asarray(b, np.float64))))
    assert abs(got - exact) <= 1e-12 * scale
    # sanity: the compensation actually matters here
    naive = float(jnp.dot(a, b))
    assert abs(naive - exact) > 10 * abs(got - exact)


def test_df_sum_tree_odd_sizes():
    rng = np.random.default_rng(3)
    for n in (1, 2, 3, 7, 100, 129):
        v = rng.standard_normal((4, n))
        hi, lo = df32.df_sum(df32.df(jnp.asarray(v, jnp.float32)), axis=-1)
        exact = np.asarray(v, np.float32).astype(np.float64).sum(-1)
        got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        np.testing.assert_allclose(got, exact, rtol=1e-13, atol=1e-13)


def test_df_add_mul_roundtrip():
    x = df32.df_from_f64(np.array([1.0 + 1e-10, 3.141592653589793]))
    y = df32.df_from_f64(np.array([1e-10, 2.718281828459045]))
    xj = (jnp.asarray(x[0]), jnp.asarray(x[1]))
    yj = (jnp.asarray(y[0]), jnp.asarray(y[1]))
    s = df32.df_add(xj, yj)
    p = df32.df_mul(xj, yj)
    s64 = df32.df_to_f64((np.asarray(s[0]), np.asarray(s[1])))
    p64 = df32.df_to_f64((np.asarray(p[0]), np.asarray(p[1])))
    xs = df32.df_to_f64(x)
    ys = df32.df_to_f64(y)
    np.testing.assert_allclose(s64, xs + ys, rtol=1e-13)
    np.testing.assert_allclose(p64, xs * ys, rtol=1e-13)


def test_df_matvec_flat_vs_f64():
    rng = np.random.default_rng(4)
    n, bu, C = 32, 16, 128
    vals64 = rng.standard_normal((n, bu, C))
    x64 = rng.standard_normal((n, C))
    vh, vl = df32.df_from_f64(vals64)
    xh, xl = df32.df_from_f64(x64)
    hi, lo = jax.jit(df32.df_matvec_flat)(
        jnp.asarray(vh), jnp.asarray(xh), jnp.asarray(xl), jnp.asarray(vl))
    exact = np.einsum("nbc,nc->nb", vals64, x64)
    got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    scale = np.abs(vals64 * x64[:, None, :]).sum(-1).max()
    np.testing.assert_allclose(got, exact, atol=1e-11 * scale)
