"""Fused multi-component Pallas F matvec vs the XLA apply (CPU
interpret mode; the on-chip A/B lives in scripts/exp_pallas_ab.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from navierstokes_tpu.fem.spaces import TaylorHoodSpace
from navierstokes_tpu.mesh import channel_with_cylinder_2d
from navierstokes_tpu.ops import assembly
from navierstokes_tpu.ops.bsr import apply_f, build_bsr
from navierstokes_tpu.ops.pallas_matvec import ROW_TILE, apply_f_fused


@pytest.fixture(scope="module")
def bsr_setup():
    mesh = channel_with_cylinder_2d(h=0.12)
    sp = TaylorHoodSpace(mesh)
    cells = assembly.cell_arrays_numpy(sp)
    bsr = build_bsr(sp, cells)
    return sp, bsr


def test_row_tile_padding(bsr_setup):
    """build_bsr pads the extended row count to the Pallas tile."""
    _, bsr = bsr_setup
    assert bsr.f_cols.shape[0] % ROW_TILE == 0


def test_fused_matches_xla(bsr_setup):
    sp, bsr = bsr_setup
    rng = np.random.default_rng(0)
    xu = jnp.asarray(rng.standard_normal((sp.n_p2, 2)), jnp.float32)
    f_blk = bsr.k_blk + 0.5 * bsr.m_blk
    y_ref = apply_f(bsr, f_blk, xu)
    y_pl = apply_f_fused(bsr, f_blk, xu, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_matches_xla_bf16(bsr_setup):
    sp, bsr = bsr_setup
    rng = np.random.default_rng(1)
    xu = jnp.asarray(rng.standard_normal((sp.n_p2, 2)), jnp.float32)
    f_blk = (bsr.k_blk + 0.5 * bsr.m_blk).astype(jnp.bfloat16)
    y_ref = apply_f(bsr, f_blk, xu)
    y_pl = apply_f_fused(bsr, f_blk, xu, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                               rtol=2e-2, atol=2e-2)
