"""Drag/lift boundary-integral postprocessing on the obstacle.

Formula parity with the reference (src/NavierStokes.cpp:879-922): at each
quadrature point of an obstacle (tag 4) face with outward-of-fluid unit
normal n = (nx, ny[, nz]) and tangent t = (ny, -nx[, 0]):

    drag += [ nu * (n . grad(u) . t) * ny - p * nx ] * JxW
    lift -= [ nu * (n . grad(u) . t) * nx + p * ny ] * JxW

with (n . grad(u) . t) = sum_{a,b} n_a  du_a/dx_b  t_b, then

    Cd = -2 drag / (U^2 * D)          [ * 1/0.41 extra in 3D, cpp:913-917 ]
    Cl = -2 lift / (U^2 * D)

where D is the configured reference length (reference hard-codes 0.4,
src/NavierStokes.hpp:256 — see BASELINE.md for the normalization caveat) and
U the inlet mean velocity (get_mean_vel, evaluated without the pulsation
factor, cpp:911).  The MPI force reduction (cpp:908-909) becomes an
on-device sum (psum-reduced when faces are sharded).
"""

from __future__ import annotations

import jax.numpy as jnp

from navierstokes_tpu.ops.assembly import FaceArrays


def drag_lift(faces: FaceArrays, u, p, nu, formula: str = "reference"):
    """Raw (drag, lift) integrals over the given faces.

    u: (n_p2, dim), p: (n_p1,).  Fully batched over faces and face quad
    points; differentiable and jittable.

    ``formula`` selects the viscous term:
      * "reference" — n . grad(u) . t, exactly what the reference computes
        (src/NavierStokes.cpp:892-902).  NOTE: this contraction is the
        tangential derivative of (u . n), which vanishes analytically on a
        no-slip boundary — the reference's printed coefficients therefore
        carry essentially no friction contribution.  Kept for output parity.
      * "st" — t . grad(u) . n = d(u_t)/dn, the Schaefer-Turek definition;
        use this to compare against published benchmark values.
    """
    u_f = jnp.take(u, faces.vel_nodes, axis=0)         # (nf, n_v, dim)
    p_f = jnp.take(p, faces.p_nodes, axis=0)           # (nf, n_p)

    # grad_u[f,q,a,b] = du_a/dx_b at face quad point q
    grad_u = jnp.einsum("fia,fqib->fqab", u_f, faces.dphi_phys)
    p_q = jnp.einsum("fj,fqj->fq", p_f, faces.phi_p)   # (nf, n_fq)

    n = faces.normals                                   # (nf, n_fq, dim)
    dim = n.shape[-1]
    if dim == 2:
        t = jnp.stack([n[..., 1], -n[..., 0]], axis=-1)
    else:
        t = jnp.stack([n[..., 1], -n[..., 0], jnp.zeros_like(n[..., 0])],
                      axis=-1)

    if formula == "st":
        ngt = jnp.einsum("fqa,fqab,fqb->fq", t, grad_u, n)  # t . grad(u) . n
    else:
        ngt = jnp.einsum("fqa,fqab,fqb->fq", n, grad_u, t)  # n . grad(u) . t
    jxw = faces.jxw
    nx = n[..., 0]                                      # (nf, n_fq)
    ny = n[..., 1]

    drag = jnp.sum((nu * ngt * ny - p_q * nx) * jxw)
    lift = -jnp.sum((nu * ngt * nx + p_q * ny) * jxw)
    return drag, lift


def force_coefficients(drag, lift, u_mean, ref_length, dim, span_3d=0.41):
    """Cd/Cl from raw integrals (cpp:913-922).  For pulsating inlets
    ``u_mean`` is the instantaneous mean (driver get_mean_vel parity);
    the denominator is clamped so the sin ~ 0 crossings yield huge-but-
    finite coefficients instead of inf/nan."""
    denom = u_mean * u_mean * ref_length
    if dim == 3:
        denom = denom * span_3d
    # weak-typed literal: preserves the operand dtype (f32 on device,
    # f64 in the host/x64 paths)
    denom = jnp.maximum(jnp.abs(denom), 1e-12)
    cd = 2.0 * -drag / denom
    cl = 2.0 * -lift / denom
    return cd, cl


def neumann_rhs(faces: FaceArrays, p_out, scat_v):
    """Outflow Neumann RHS contribution: -p_out * int_{Gamma_out} (n . v)
    (reference: src/NavierStokes.cpp:257-278).  Returns (n_p2, dim)."""
    # r[f,a,d] = -p_out * sum_q jxw[f,q] phi_v[f,q,a] n[f,q,d]
    r = -p_out * jnp.einsum("fq,fqa,fqd->fad", faces.jxw, faces.phi_v,
                            faces.normals)
    return scat_v(r.reshape(-1, r.shape[-1]))
