"""Steady Stokes solver — a second model family sharing the whole stack.

Not present as a standalone solver in the reference (its class is named
"NavierStokes" but the Stokes operator is the nu*K + pressure-coupling
subset of its assembly, src/NavierStokes.cpp:196-229).  Useful on its own
and as the manufactured-solution convergence fixture for the Taylor-Hood
discretization (SURVEY.md par.4 calls for convergence tests the reference
lacks).

Solves   [ nu K   G ] [u]   [ f ]
         [ G^T    0 ] [p] = [ 0 ]     with Dirichlet velocity BCs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from navierstokes_tpu.config import SolverConfig
from navierstokes_tpu.fem.spaces import TaylorHoodSpace
from navierstokes_tpu.mesh.geometry import Mesh
from navierstokes_tpu.ops.assembly import build_cell_arrays
from navierstokes_tpu.ops.operators import (apply_blocks, build_scatter,
                                            f_diag, schur_diag)
from navierstokes_tpu.solvers.krylov import fgmres
from navierstokes_tpu.solvers.preconditioners import InnerSolve, make_asimple


class StokesSolver:
    def __init__(self, mesh: Mesh, nu: float = 1.0,
                 config: SolverConfig | None = None,
                 degree_velocity: int = 2, degree_pressure: int = 1):
        self.config = config or SolverConfig()
        self.nu = nu
        self.mesh = mesh
        # arbitrary Taylor-Hood pairs (reference ctor generality,
        # src/NavierStokes.hpp:173-178); every element/operator kernel
        # below is degree-generic — tests/test_degrees.py verifies the
        # P3/P2 orders
        self.space = TaylorHoodSpace(mesh, degree_velocity, degree_pressure)
        self.dtype = jnp.dtype(self.config.dtype)
        sp = self.space
        self.cells = build_cell_arrays(sp, dtype=self.dtype)
        self.scat_v = build_scatter(sp.cell_p2, sp.n_p2)
        self.scat_p = build_scatter(sp.cell_p1, sp.n_p1)

    def solve(self, dirichlet_nodes: np.ndarray, dirichlet_values: np.ndarray,
              rhs_u=None, pin_pressure: bool = True, tol: float = 1e-10,
              maxiter: int = 400):
        """dirichlet_nodes: P2 node ids with prescribed velocity;
        dirichlet_values: (n_dir, dim).  With all-Dirichlet boundaries the
        pressure is defined up to a constant; ``pin_pressure`` removes the
        mean after the solve."""
        sp = self.space
        dim = sp.dim
        mask_np = np.ones((sp.n_p2, 1))
        mask_np[dirichlet_nodes] = 0.0
        g_np = np.zeros((sp.n_p2, dim))
        g_np[dirichlet_nodes] = dirichlet_values
        mask = jnp.asarray(mask_np, self.dtype)
        g = jnp.asarray(g_np, self.dtype)

        cells = self.cells
        f_cell = self.nu * cells.stiff
        scat_v, scat_p = self.scat_v, self.scat_p
        zero_p = jnp.zeros(sp.n_p1, self.dtype)

        d = f_diag(cells, f_cell, scat_v)
        mflat = mask[:, 0]
        sigma = jnp.sum(d * mflat) / jnp.maximum(jnp.sum(mflat), 1.0)
        d_bc = d * mflat + sigma * (1.0 - mflat)
        dinv = (1.0 / d_bc)[:, None]

        def apply_A(x):
            xu, xp = x
            xum = xu * mask
            yu, yp = apply_blocks(cells, f_cell, scat_v, scat_p, xum, xp)
            return yu * mask + sigma * (xu - xum), yp

        def apply_F(xu):
            xum = xu * mask
            yu, _ = apply_blocks(cells, f_cell, scat_v, scat_p, xum, zero_p,
                                 with_g=False, with_gt=False)
            return yu * mask + sigma * (xu - xum)

        def apply_B(xu):
            _, yp = apply_blocks(cells, f_cell, scat_v, scat_p, xu * mask,
                                 zero_p, with_f=False, with_g=False)
            return yp

        def apply_Bt(xp):
            yu, _ = apply_blocks(cells, f_cell, scat_v, scat_p,
                                 jnp.zeros((sp.n_p2, dim), self.dtype), xp,
                                 with_f=False, with_gt=False)
            return yu * mask

        b_u = (jnp.zeros((sp.n_p2, dim), self.dtype) if rhs_u is None
               else jnp.asarray(rhs_u, self.dtype))
        ag_u, ag_p = apply_blocks(cells, f_cell, scat_v, scat_p, g, zero_p)
        b = ((b_u - ag_u) * mask + sigma * g, -ag_p)

        diag_s = schur_diag(cells, dinv[:, 0] * mflat, scat_p)
        M = make_asimple(apply_F, apply_B, apply_Bt, dinv, diag_s, 1.0,
                         InnerSolve(1e-3, 50), InnerSolve(1e-3, 50))

        res = jax.jit(lambda b: fgmres(apply_A, b, tol=tol, restart=60,
                                       maxiter=maxiter, precond=M))(b)
        u, p = res.x
        u = u * mask + g
        if pin_pressure:
            # remove mean pressure (mass-weighted over vertices)
            p = p - jnp.mean(p)
        return np.asarray(u), np.asarray(p), res
