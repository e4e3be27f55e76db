"""CLI smoke tests (scenario registry + argument plumbing)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from navierstokes_tpu.scenarios.cli import main
from navierstokes_tpu.scenarios.registry import SCENARIOS, build_solver


def test_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    for name in SCENARIOS:
        assert name in out


def test_scenario_registry_builds():
    # every scenario must instantiate (coarse meshes for speed)
    for name, sc in SCENARIOS.items():
        h = 0.1 if sc.dim == 2 else 0.1
        ns = build_solver(name, h=h)
        assert ns.config.deltat == sc.deltat
        assert ns.inlet.kind == sc.inlet.kind


def test_run_smoke(tmp_path):
    rc = main(["run", "2d-test1", "--h", "0.1", "--T", "0.02",
               "--deltat", "0.01", "--output-step", "2",
               "--dtype", "float64",
               "--output-dir", str(tmp_path / "out"),
               "--cache-dir", str(tmp_path / "cache"),
               "--csv", str(tmp_path / "forces.csv")])
    assert rc == 0
    assert os.path.exists(tmp_path / "forces.csv")
    with open(tmp_path / "forces.csv") as f:
        assert len(f.readlines()) == 3  # header + 2 steps


def test_postprocess_smoke(tmp_path):
    args = ["--h", "0.1", "--T", "0.02", "--deltat", "0.01",
            "--output-step", "2", "--dtype", "float64",
            "--output-dir", str(tmp_path / "out"),
            "--cache-dir", str(tmp_path / "cache"),
            "--csv", str(tmp_path / "forces.csv")]
    assert main(["run", "2d-test1"] + args) == 0
    assert main(["postprocess", "2d-test1", "--t0", "0", "--t1", "2",
                 "--step", "2"] + args) == 0
    # post_process wrote VTU replays
    assert os.path.exists(tmp_path / "out" / "output-stokes_000000.vtu")


def test_sweep_naca_lift_monotone(tmp_path, monkeypatch):
    """AoA sweep end-to-end (tests/2D/test_naca/run_test.sh parity): at
    small angles lift grows with angle of attack; per-angle csv artifacts
    are produced."""
    monkeypatch.chdir(tmp_path)
    rc = main(["sweep-naca", "--angles", "2", "8", "--h", "0.1",
               "--T", "0.4", "--deltat", "0.01", "--output-step", "40",
               "--dtype", "float64",
               "--output-dir", str(tmp_path / "out"),
               "--cache-dir", str(tmp_path / "cache")])
    assert rc == 0
    assert os.path.exists(tmp_path / "output_2.csv")
    assert os.path.exists(tmp_path / "output_8.csv")

    def tail_cl(p):
        rows = np.genfromtxt(p, delimiter=",", names=True)
        return float(np.mean(np.atleast_1d(rows["Cl"])[-10:]))

    cl2 = tail_cl(tmp_path / "output_2.csv")
    cl8 = tail_cl(tmp_path / "output_8.csv")
    assert cl8 > cl2
