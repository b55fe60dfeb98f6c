"""Method-of-manufactured-solutions convergence on the unit cube.

Mirrors the reference ``tests/fem/test_mms_cube_3d.py``: sympy-symbolic
u_exact -> b = -div(sigma(u)) lambdified to jax, Dirichlet from u_exact on
every face, and L2 / H1 error rates asserted >= 1.9 / >= 0.9 under mesh
halving for linear elements (hex and tet).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest
import sympy as sp

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


def _manufactured():
    """u_exact, grad_u_exact, body force b = -div(sigma) as jax callables."""
    x, y, z = sp.symbols("x y z")
    s = 0.01
    u = sp.Matrix([
        s * sp.sin(sp.pi * x) * sp.sin(sp.pi * y) * sp.sin(sp.pi * z),
        s * sp.cos(sp.pi * x) * sp.sin(sp.pi * y) * sp.sin(sp.pi * z),
        s * sp.sin(sp.pi * x) * sp.cos(sp.pi * y) * sp.sin(sp.pi * z),
    ])
    coords = (x, y, z)
    grad_u = u.jacobian(coords)
    eps = (grad_u + grad_u.T) / 2
    lam = E_MOD * NU / ((1 + NU) * (1 - 2 * NU))
    mu = E_MOD / (2 * (1 + NU))
    sigma = lam * eps.trace() * sp.eye(3) + 2 * mu * eps
    b = -sp.Matrix([sum(sp.diff(sigma[i, j], coords[j]) for j in range(3))
                    for i in range(3)])

    u_fn = sp.lambdify(coords, u.T.tolist()[0], modules="jax")
    grad_fn = sp.lambdify(coords, grad_u.tolist(), modules="jax")
    b_fn = sp.lambdify(coords, b.T.tolist()[0], modules="jax")
    return u_fn, grad_fn, b_fn


U_FN, GRAD_FN, B_FN = _manufactured()


def _solve(mesh, fe_layout, quadrature=None):
    all_sides = [s for s in mesh.side_sets if s.endswith("_sides")]

    def u_bc(coords, t):
        vals = U_FN(coords[:, 0], coords[:, 1], coords[:, 2])
        return t * jnp.stack(vals, axis=-1)

    bcs = [DirichletBC(all_sides, "u", [0, 1, 2], u_bc)]
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", fe_layout)],
                            bcs, {"u": 3})
    gr = SmallDispEquilibrium(ndims=3)
    model = Elastic(Parameters({"elastic": {"E": E_MOD, "nu": NU}}))

    def body_force(coords, t):
        return t * jnp.stack(B_FN(coords[0], coords[1], coords[2]))

    fe = build_fe_problem(mesh, dof_map, gr, {"all": model},
                          forcing_fns_by_block_idx={0: body_force},
                          assembly_quadrature=quadrature)
    state, _ = fe_quasistatic_drive(fe, [0.0, 1.0])
    return fe, state


def _errors(fe, state):
    """Quadrature L2 and H1-seminorm errors of the final step."""
    U = jnp.asarray(state.U_at(1))
    arrays = fe.kernel_arrays
    geom = arrays.geometry_cache["all"]
    gather = arrays.u_gather_eq_by_block["all"][0]   # (n_e, nbf, 3)
    U_elem = U[gather]

    N = geom["shared"]["N"][0]                       # (n_ip, nbf)
    gradN = geom["per_elem"]["grad_N_phys"][0]       # (n_e, n_ip, nbf, 3)
    det = geom["per_elem"]["iso_jac_det"]            # (n_e, n_ip)
    w = geom["shared"]["quad_w"]
    coords = geom["per_elem"]["coords_ip"]           # (n_e, n_ip, 3)

    u_h = jnp.einsum("pa,eak->epk", N, U_elem)
    grad_h = jnp.einsum("eak,epaj->epkj", U_elem, gradN)

    cx, cy, cz = coords[..., 0], coords[..., 1], coords[..., 2]
    u_ex = jnp.stack(U_FN(cx, cy, cz), axis=-1)
    g_rows = GRAD_FN(cx, cy, cz)
    grad_ex = jnp.stack(
        [jnp.stack([jnp.broadcast_to(g_rows[i][j], cx.shape)
                    for j in range(3)], axis=-1)
         for i in range(3)], axis=-2)

    dv = det * w[None, :]
    l2 = jnp.sqrt(jnp.sum(jnp.sum((u_h - u_ex) ** 2, axis=-1) * dv))
    h1 = jnp.sqrt(jnp.sum(jnp.sum((grad_h - grad_ex) ** 2,
                                  axis=(-2, -1)) * dv))
    return float(l2), float(h1)


@pytest.mark.parametrize("family", ["hex", "tet"])
def test_mms_convergence_rates(family):
    from cmad_tpu.fem.quadrature import tet_quadrature
    from cmad_tpu.fem.topology import ElementFamily

    # the 6-tet split's element quality delays the asymptotic regime, so
    # the tet pair sits one refinement deeper (rates at (4, 8): 1.76/0.94)
    sizes = (3, 6) if family == "hex" else (8, 16)
    quadrature = None
    if family == "tet":
        # a degree-2 rule integrates the sinusoidal forcing and the error
        # norms accurately enough to see the asymptotic rate
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
    assert l2_rate > 1.9, f"{family}: L2 rate {l2_rate:.2f}"
    assert h1_rate > 0.9, f"{family}: H1 rate {h1_rate:.2f}"
