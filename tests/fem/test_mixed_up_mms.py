"""MMS convergence for the stabilized mixed (u-p) SmallDispEquilibrium.

Mirrors the reference ``tests/fem/test_mixed_up_mms.py``: a
divergence-free manufactured displacement makes the exact pressure zero
(``p = -kappa tr(eps) = 0``), so the grad(p) stabilization term stays
consistent with no manufactured source of its own, and the ordinary
displacement body force ``b = -div(sigma(u))`` drives the mixed solve.
With ``div u = 0`` the volumetric stress drops out and
``b = -mu lapl(u) = 2 mu pi^2 u`` for the classic cross-product
sinusoid. Asserts L2 / H1 displacement rates (>= 1.9 / >= 0.9) AND a
pressure-L2 rate under mesh halving, on hex and tet meshes — the
tau ~ h^2 stabilization scaling is exactly what a rate check catches.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.fem.bcs import DirichletBC
from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
from cmad_tpu.fem.driver import fe_quasistatic_drive
from cmad_tpu.fem.elements import P1_TET, Q1_HEX
from cmad_tpu.fem.fe_problem import build_fe_problem
from cmad_tpu.fem.mesh import StructuredHexMesh, hex_to_tet_split
from cmad_tpu.global_residuals.small_disp_equilibrium import (
    SmallDispEquilibrium,
)
from cmad_tpu.models.elastic import Elastic
from cmad_tpu.parameters.parameters import Parameters

E_MOD, NU = 1000.0, 0.3
MU = E_MOD / (2.0 * (1.0 + NU))
PI = np.pi


def _u_exact(cx, cy, cz):
    """Each component independent of its own coordinate -> div u = 0."""
    return (jnp.sin(PI * cy) * jnp.sin(PI * cz),
            jnp.sin(PI * cz) * jnp.sin(PI * cx),
            jnp.sin(PI * cx) * jnp.sin(PI * cy))


def _grad_exact(cx, cy, cz):
    """grad_u[i][j] = d u_i / d x_j (rows broadcastable over points)."""
    z = jnp.zeros_like(cx)
    c = PI
    return (
        (z, c * jnp.cos(c * cy) * jnp.sin(c * cz),
         c * jnp.sin(c * cy) * jnp.cos(c * cz)),
        (c * jnp.sin(c * cz) * jnp.cos(c * cx), z,
         c * jnp.cos(c * cz) * jnp.sin(c * cx)),
        (c * jnp.cos(c * cx) * jnp.sin(c * cy),
         c * jnp.sin(c * cx) * jnp.cos(c * cy), z),
    )


def _body_force(coords, t):
    # b = -div(2 mu eps(u)) = -mu (lapl u + grad(div u)) = 2 mu pi^2 u
    ux, uy, uz = _u_exact(coords[0], coords[1], coords[2])
    return 2.0 * MU * PI * PI * t * jnp.stack([ux, uy, uz])


def _solve(mesh, fe_layout, quadrature=None):
    all_sides = [s for s in mesh.side_sets if s.endswith("_sides")]

    def u_bc(coords, t):
        vals = _u_exact(coords[:, 0], coords[:, 1], coords[:, 2])
        return t * jnp.stack(vals, axis=-1)

    bcs = [DirichletBC(all_sides, "u", [0, 1, 2], u_bc)]
    dof_map = build_dof_map(
        mesh, [GlobalFieldLayout("u", fe_layout),
               GlobalFieldLayout("p", fe_layout)], bcs, {"u": 3, "p": 1})
    gr = SmallDispEquilibrium(ndims=3, mixed=True)
    model = Elastic(Parameters({"elastic": {"E": E_MOD, "nu": NU}}))
    fe = build_fe_problem(mesh, dof_map, gr, {"all": model},
                          forcing_fns_by_block_idx={0: _body_force},
                          assembly_quadrature=quadrature)
    state, _ = fe_quasistatic_drive(fe, [0.0, 1.0])
    return fe, state


def _errors(fe, state):
    """Quadrature L2/H1 errors of u and L2 norm of p (p_exact = 0)."""
    U = jnp.asarray(state.U_at(1))
    arrays = fe.kernel_arrays
    geom = arrays.geometry_cache["all"]
    U_elem = U[arrays.u_gather_eq_by_block["all"][0]]   # (n_e, nbf, 3)
    p_elem = U[arrays.u_gather_eq_by_block["all"][1]][..., 0]

    N = geom["shared"]["N"][0]                          # (n_ip, nbf)
    gradN = geom["per_elem"]["grad_N_phys"][0]
    det = geom["per_elem"]["iso_jac_det"]
    w = geom["shared"]["quad_w"]
    coords = geom["per_elem"]["coords_ip"]

    u_h = jnp.einsum("pa,eak->epk", N, U_elem)
    grad_h = jnp.einsum("eak,epaj->epkj", U_elem, gradN)
    p_h = jnp.einsum("pa,ea->ep", N, p_elem)

    cx, cy, cz = coords[..., 0], coords[..., 1], coords[..., 2]
    u_ex = jnp.stack(_u_exact(cx, cy, cz), axis=-1)
    g_rows = _grad_exact(cx, cy, cz)
    grad_ex = jnp.stack(
        [jnp.stack([jnp.broadcast_to(g_rows[i][j], cx.shape)
                    for j in range(3)], axis=-1)
         for i in range(3)], axis=-2)

    dv = det * w[None, :]
    l2 = jnp.sqrt(jnp.sum(jnp.sum((u_h - u_ex) ** 2, axis=-1) * dv))
    h1 = jnp.sqrt(jnp.sum(jnp.sum((grad_h - grad_ex) ** 2,
                                  axis=(-2, -1)) * dv))
    p_l2 = jnp.sqrt(jnp.sum(p_h ** 2 * dv))
    return float(l2), float(h1), float(p_l2)


@pytest.mark.parametrize("family", ["hex", "tet"])
def test_mixed_up_mms_rates(family):
    from cmad_tpu.fem.quadrature import tet_quadrature
    from cmad_tpu.fem.topology import ElementFamily

    # tets sit one refinement deeper (6-tet-split element quality), as in
    # the pure-displacement MMS test
    sizes = (4, 8) if family == "hex" else (8, 16)
    quadrature = None
    if family == "tet":
        quadrature = {ElementFamily.TET_LINEAR: tet_quadrature(2)}

    errs = []
    for n in sizes:
        mesh = StructuredHexMesh((1.0, 1.0, 1.0), (n, n, n))
        layout = Q1_HEX
        if family == "tet":
            mesh = hex_to_tet_split(mesh)
            layout = P1_TET
        fe, state = _solve(mesh, layout, quadrature)
        errs.append(_errors(fe, state))

    l2_rate = np.log2(errs[0][0] / errs[1][0])
    h1_rate = np.log2(errs[0][1] / errs[1][1])
    p_rate = np.log2(errs[0][2] / errs[1][2])
    assert l2_rate > 1.9, f"{family}: u L2 rate {l2_rate:.2f}"
    assert h1_rate > 0.9, f"{family}: u H1 rate {h1_rate:.2f}"
    # equal-order stabilized pressure: at least first-order in L2 (the
    # observed rate is ~2 on hex; keep the bar conservative)
    assert p_rate > 0.9, f"{family}: p L2 rate {p_rate:.2f}"
