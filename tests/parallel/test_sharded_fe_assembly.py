"""Element-sharded FE residual assembly matches single-device assembly.

Runs on the 8 virtual CPU devices from conftest; the same placement
code drives a real TPU mesh.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cmad_tpu.fem.assembly import (
    assemble_global_residual,
    params_by_block_from_models,
)
from cmad_tpu.fem.fe_problem import FEState
from cmad_tpu.parallel.fe import (
    shard_fe_arrays,
    shard_xi_by_block,
    sharded_assemble_global_residual,
)
from cmad_tpu.parallel.mesh import element_mesh

from tests.fem.test_fe_core import (
    GlobalResidualMode,
    SmallRateElasticPlastic,
    _mesh_and_dofmap,
    _plastic_params,
    build_fe_problem,
)
from cmad_tpu.global_residuals.small_disp_equilibrium import (
    SmallDispEquilibrium,
)


def test_sharded_residual_matches_single_device():
    assert len(jax.devices()) >= 8  # conftest virtual mesh

    mesh_fe, dof_map = _mesh_and_dofmap(ramp=0.003)
    gr = SmallDispEquilibrium(ndims=3)
    model = SmallRateElasticPlastic(_plastic_params())
    fe = build_fe_problem(mesh_fe, dof_map, gr, {"all": model},
                          modes_by_block={"all": GlobalResidualMode.COUPLED})
    params = params_by_block_from_models(fe)

    st = FEState.from_problem(fe)
    xi_prev = {"all": jnp.asarray(st.xi_at(0, "all"))}
    rng = np.random.RandomState(0)
    n = fe.dof_map.num_total_dofs
    U = jnp.asarray(rng.normal(0.0, 1e-4, size=n))
    U_prev = jnp.zeros(n)

    R_single = assemble_global_residual(
        fe, fe.kernel_arrays, params, U, U_prev, 1.0,
        xi_prev_by_block=xi_prev)

    dev_mesh = element_mesh(8)
    arrays = shard_fe_arrays(fe, dev_mesh)
    xi_sh = shard_xi_by_block(xi_prev, dev_mesh)
    R_sharded = sharded_assemble_global_residual(
        fe, arrays, params, U, U_prev, 1.0, xi_prev_by_block=xi_sh)

    assert np.allclose(np.asarray(R_sharded), np.asarray(R_single),
                       atol=1e-10)
