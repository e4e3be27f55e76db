"""Compensated iterative refinement (solvers/refine.py): the monolithic
fp32 solve with ``refine>0`` must reach the f64 solution, breaking the
fp32 attainable-residual floor that motivated it (VERDICT round-2 item 4;
reference solves all-f64, src/NavierStokes.cpp:348, 377)."""

import os

import numpy as np
import pytest

from navierstokes_tpu.config import InletConfig, SolverConfig
from navierstokes_tpu.mesh import channel_with_cylinder_2d
from navierstokes_tpu.models.navier_stokes import NavierStokes


@pytest.fixture(scope="module")
def mesh():
    return channel_with_cylinder_2d(h=0.1, h_near=0.04)


def _run(mesh, tmp, tag, **cfg_kw):
    inlet = InletConfig(kind="parabolic", u_m=0.3, height=0.41)
    cfg = SolverConfig(output_dir=os.path.join(tmp, tag, "out"),
                       cache_dir=os.path.join(tmp, tag, "cache"),
                       csv_path=os.path.join(tmp, tag, "forces.csv"),
                       **cfg_kw)
    ns = NavierStokes(mesh, 2, 1, deltat=0.01, T=0.03, step=100,
                      inlet=inlet, config=cfg)
    ns.set_re_number(20)
    ns.setup()
    res = [ns.solve_time_step() for _ in range(3)]
    return ns, res


def test_refined_fp32_matches_f64(mesh, tmp_path):
    tmp = str(tmp_path)
    f64, _ = _run(mesh, tmp, "f64", dtype="float64", outer_tol=1e-12)
    raw, m_raw = _run(mesh, tmp, "raw", dtype="float32")
    ref, m_ref = _run(mesh, tmp, "ref", dtype="float32", refine=2,
                      refine_tol=1e-3)
    u64 = np.asarray(f64._u, np.float64)
    scale = np.abs(u64).max()
    err_raw = np.abs(np.asarray(raw._u, np.float64) - u64).max() / scale
    err_ref = np.abs(np.asarray(ref._u, np.float64) - u64).max() / scale
    # the refined solution lands near fp32 representation accuracy of the
    # f64 trajectory; unrefined fp32 is orders above it
    assert err_ref < 3e-6, err_ref
    assert err_ref < err_raw / 5, (err_ref, err_raw)
    # the recorded residual is the df-computed TRUE residual of the
    # refined solution — far below the unrefined solve's
    assert (float(m_ref[-1].residual)
            < 0.1 * float(m_raw[-1].residual)), (
        float(m_ref[-1].residual), float(m_raw[-1].residual))


def test_refine_skips_cleanly_off(mesh, tmp_path):
    # refine=0 path unchanged (smoke: same config runs, finite forces)
    ns, _ = _run(mesh, str(tmp_path), "off", dtype="float32", refine=0)
    assert np.isfinite(float(ns.cd))
