"""MMS convergence with an exact-traction Neumann face.

Mirrors the reference ``tests/fem/test_mms_cube_3d_neumann.py``: same
manufactured solution as test_mms_cube, but the xmax face carries the
exact traction sigma(u_exact) . n instead of a Dirichlet clamp, so the
surface-flux assembly enters the convergence path.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import sympy as sp

from cmad_tpu.fem.bcs import DirichletBC, NeumannBC
from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
from cmad_tpu.fem.driver import fe_quasistatic_drive
from cmad_tpu.fem.elements import Q1_HEX
from cmad_tpu.fem.fe_problem import build_fe_problem
from cmad_tpu.fem.mesh import StructuredHexMesh
from cmad_tpu.global_residuals.small_disp_equilibrium import (
    SmallDispEquilibrium,
)
from cmad_tpu.models.elastic import Elastic
from cmad_tpu.parameters.parameters import Parameters

from tests.fem.test_mms_cube import E_MOD, NU, U_FN, _errors


def _traction_xmax():
    """t_i = sigma_ij(u_exact) n_j on the x = 1 face (n = +e_x)."""
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
    t_vec = (sigma @ sp.Matrix([1, 0, 0])).subs(x, 1)
    return sp.lambdify((y, z), t_vec.T.tolist()[0], modules="jax")


T_FN = _traction_xmax()


def _body_force():
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
    return sp.lambdify(coords, b.T.tolist()[0], modules="jax")


B_FN = _body_force()


def _solve(n):
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (n, n, n))
    dirichlet_sides = [s for s in mesh.side_sets
                       if s.endswith("_sides") and s != "xmax_sides"]

    def u_bc(coords, t):
        vals = U_FN(coords[:, 0], coords[:, 1], coords[:, 2])
        return t * jnp.stack(vals, axis=-1)

    def traction(coords, t):
        y, z = coords[:, 1], coords[:, 2]
        # constant components lambdify to scalars — broadcast them
        vals = [jnp.broadcast_to(jnp.asarray(v, dtype=y.dtype), y.shape)
                for v in T_FN(y, z)]
        return t * jnp.stack(vals, axis=-1)

    bcs = [DirichletBC(dirichlet_sides, "u", [0, 1, 2], u_bc)]
    nbcs = [NeumannBC(["xmax_sides"], "u", traction)]
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], bcs,
                            {"u": 3})
    model = Elastic(Parameters({"elastic": {"E": E_MOD, "nu": NU}}))

    def body_force(coords, t):
        return t * jnp.stack(B_FN(coords[0], coords[1], coords[2]))

    fe = build_fe_problem(mesh, dof_map, SmallDispEquilibrium(ndims=3),
                          {"all": model},
                          forcing_fns_by_block_idx={0: body_force},
                          neumann_bcs=nbcs)
    state, _ = fe_quasistatic_drive(fe, [0.0, 1.0])
    return fe, state


def test_mms_neumann_convergence_rates():
    errs = [_errors(*_solve(n)) for n in (3, 6)]
    l2_rate = np.log2(errs[0][0] / errs[1][0])
    h1_rate = np.log2(errs[0][1] / errs[1][1])
    assert l2_rate > 1.9, f"L2 rate {l2_rate:.2f}"
    assert h1_rate > 0.9, f"H1 rate {h1_rate:.2f}"
