"""Mesh-sharded CG vs the single-device solver on a real FE tangent.

Runs on the 8-virtual-device CPU mesh from conftest; the same code path
drives a real TPU slice (SURVEY.md section 2.2: distributed sparse
solve).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cmad_tpu.fem.assembly import assemble_global
from cmad_tpu.fem.bcs import DirichletBC
from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
from cmad_tpu.fem.elements import Q1_HEX
from cmad_tpu.fem.fe_problem import build_fe_problem
from cmad_tpu.fem.mesh import StructuredHexMesh
from cmad_tpu.fem.sparse_solve import _embedded_bc_enforce, jax_cg
from cmad_tpu.global_residuals.modes import GlobalResidualMode
from cmad_tpu.global_residuals.small_disp_equilibrium import (
    SmallDispEquilibrium,
)
from cmad_tpu.models.elastic import Elastic
from cmad_tpu.parallel.solve import (
    build_row_sharded_pattern,
    sharded_jax_cg,
)
from cmad_tpu.parameters.parameters import Parameters


@pytest.fixture(scope="module")
def system():
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    bcs = [DirichletBC(["xmin_sides"], "u", [0, 1, 2], None)]
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], bcs,
                            {"u": 3})
    model = Elastic(Parameters({"elastic": {"E": 1000.0, "nu": 0.3}}))
    fe = build_fe_problem(
        mesh, dof_map, SmallDispEquilibrium(ndims=3), {"all": model},
        modes_by_block={"all": GlobalResidualMode.CLOSED_FORM})
    arrays = fe.kernel_arrays
    n = dof_map.num_total_dofs

    def K_data_of(E):
        m = Elastic(Parameters({"elastic": {"E": E, "nu": 0.3}}))
        U = jnp.zeros(n)
        K_bcoo, _, _ = assemble_global(
            fe, arrays, {"all": m.parameters.values}, U, U, 1.0)
        K_data, _ = _embedded_bc_enforce(K_bcoo,
                                         arrays.prescribed_indices)
        return K_data

    b = jnp.asarray(np.random.RandomState(0).normal(size=n))
    return fe, arrays, K_data_of, b


@pytest.fixture(scope="module")
def device_mesh():
    devs = np.array(jax.devices())
    assert devs.size == 8, "conftest must provide 8 virtual devices"
    return Mesh(devs, ("elem",))


def test_sharded_cg_matches_single_device(system, device_mesh):
    fe, arrays, K_data_of, b = system
    K_data = K_data_of(1000.0)
    sp = arrays.embedded_sparsity
    x_ref = jax_cg(K_data, sp, b, rtol=1e-12)
    x_sh = sharded_jax_cg(K_data, sp, b, device_mesh, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               rtol=1e-9, atol=1e-12)


def test_sharded_cg_under_jit_with_reused_pattern(system, device_mesh):
    fe, arrays, K_data_of, b = system
    sp = arrays.embedded_sparsity
    pattern = build_row_sharded_pattern(sp, device_mesh)

    @jax.jit
    def solve(K_data, rhs):
        return sharded_jax_cg(K_data, sp, rhs, device_mesh, rtol=1e-12,
                              pattern=pattern)

    K_data = K_data_of(1000.0)
    x = solve(K_data, b)
    x_ref = jax_cg(K_data, sp, b, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=1e-9, atol=1e-12)


def test_grad_through_sharded_cg(system, device_mesh):
    """d/dE of a functional of K(E)^-1 b agrees with finite differences
    — custom_linear_solve transposes through the sharded matvec."""
    fe, arrays, K_data_of, b = system
    sp = arrays.embedded_sparsity
    pattern = build_row_sharded_pattern(sp, device_mesh)

    def loss(E):
        x = sharded_jax_cg(K_data_of(E), sp, b, device_mesh, rtol=1e-13,
                           pattern=pattern)
        return jnp.sum(x * x)

    g = float(jax.grad(loss)(1000.0))
    h = 1.0
    fd = (float(loss(1000.0 + h)) - float(loss(1000.0 - h))) / (2 * h)
    # central-diff truncation for loss ~ E^-2 is 2 h^2/E^2 = 2e-6 relative
    np.testing.assert_allclose(g, fd, rtol=1e-5)


def test_sharded_gmres_matches_single_device(system, device_mesh):
    from cmad_tpu.fem.sparse_solve import jax_gmres
    from cmad_tpu.parallel.solve import sharded_jax_gmres

    fe, arrays, K_data_of, b = system
    sp = arrays.embedded_sparsity
    K_data = K_data_of(1000.0)
    x_ref = jax_gmres(K_data, sp, b, rtol=1e-12, max_iters=4000,
                      restart=40)
    x_sh = sharded_jax_gmres(K_data, sp, b, device_mesh, rtol=1e-12,
                             max_iters=4000, restart=40)
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               rtol=1e-7, atol=1e-10)


def test_sharded_cg_two_level_matches_direct(system, device_mesh):
    from cmad_tpu.fem.nonlinear_solver import get_two_level_pattern
    from cmad_tpu.fem.sparse_solve import scipy_lu
    from cmad_tpu.parallel.solve import sharded_jax_cg_two_level

    fe, arrays, K_data_of, b = system
    sp = arrays.embedded_sparsity
    K_data = K_data_of(1000.0)
    tl = get_two_level_pattern(fe, 8)
    x_ref = scipy_lu(K_data, sp, b)
    x_sh = sharded_jax_cg_two_level(K_data, sp, b, device_mesh, tl,
                                    rtol=1e-12, max_iters=4000)
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               rtol=1e-7, atol=1e-10)


def test_grad_through_sharded_gmres(system, device_mesh):
    from cmad_tpu.parallel.solve import sharded_jax_gmres
    from cmad_tpu.fem.sparse_solve import scipy_lu

    fe, arrays, K_data_of, b = system
    sp = arrays.embedded_sparsity

    def loss_sh(E):
        x = sharded_jax_gmres(K_data_of(E), sp, b, device_mesh,
                              rtol=1e-12, max_iters=4000, restart=40)
        return jnp.sum(x ** 2)

    def loss_ref(E):
        return jnp.sum(scipy_lu(K_data_of(E), sp, b) ** 2)

    g_sh = float(jax.grad(loss_sh)(1000.0))
    g_ref = float(jax.grad(loss_ref)(1000.0))
    np.testing.assert_allclose(g_sh, g_ref, rtol=1e-5)
