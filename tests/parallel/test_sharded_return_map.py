"""Element-parallel sharded return map on the 8-virtual-device CPU mesh.

The reference has no distributed execution (SURVEY.md section 2.2); this
covers cmad_tpu's data-parallel-over-elements story: sharded point batch,
replicated parameters, identical numerics to single-device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.ops.return_map import (
    make_batched_return_map,
    make_sharded_return_map,
)
from cmad_tpu.parallel.mesh import element_mesh, replicated, shard_points

from tests.support.problems import J2AnalyticalProblem
from cmad_tpu.models.small_rate_elastic_plastic import SmallRateElasticPlastic


@pytest.fixture(scope="module")
def setup():
    problem = J2AnalyticalProblem()
    model = SmallRateElasticPlastic(problem.J2_parameters)
    batch = 64
    rng = np.random.RandomState(0)
    eps = rng.normal(0.0, 1.5e-3, size=(batch, 3, 3))
    eps = 0.5 * (eps + np.transpose(eps, (0, 2, 1)))
    grad_u = jnp.asarray(eps)
    grad_u_prev = jnp.zeros((batch, 3, 3))
    xi_prev = jnp.zeros((batch, model.num_dofs))
    return model, problem.J2_parameters, xi_prev, grad_u, grad_u_prev


def test_mesh_has_8_devices():
    mesh = element_mesh()
    assert mesh.devices.size == 8


def test_sharded_matches_single_device(setup):
    model, params, xi_prev, grad_u, grad_u_prev = setup

    step_single = make_batched_return_map(model)
    xi_s, sigma_s = step_single(xi_prev, grad_u, grad_u_prev, params.values)

    mesh = element_mesh()
    step_sharded = make_sharded_return_map(model, mesh)
    shard = shard_points(mesh)
    xi_p = jax.device_put(xi_prev, shard)
    gu_p = jax.device_put(grad_u, shard)
    gup_p = jax.device_put(grad_u_prev, shard)
    pv = jax.device_put(params.values, replicated(mesh))
    xi_m, sigma_m = step_sharded(xi_p, gu_p, gup_p, pv)

    assert np.allclose(np.asarray(xi_s), np.asarray(xi_m), atol=1e-12)
    assert np.allclose(np.asarray(sigma_s), np.asarray(sigma_m), atol=1e-10)
    # output actually sharded across the mesh
    assert len(xi_m.sharding.device_set) == 8


def test_graft_entry_contract():
    """The driver contract: entry() compiles, dryrun_multichip(8) runs."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "_graft_entry",
        Path(__file__).resolve().parents[2] / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    mod.dryrun_multichip(8)


def test_sharded_principal_hosford_matches_single_device():
    """The frame-invariant Hosford reduction shards like any other
    point kernel: specialize=True dispatches the trial-eigenbasis
    solve, XLA partitions it with zero collectives, numerics match
    the single-device run exactly."""
    from cmad_tpu.parameters.parameters import Parameters

    params = Parameters({
        "rotation matrix": np.eye(3),
        "elastic": {"E": 200e3, "nu": 0.3},
        "plastic": {
            "effective stress": {"hosford_principal": {"a": 8.0}},
            "flow stress": {"initial yield": {"Y": 200.0},
                            "hardening": {"voce": {"S": 200.0,
                                                   "D": 20.0}}}}})
    model = SmallRateElasticPlastic(params)
    batch = 64
    rng = np.random.RandomState(3)
    grad_u = jnp.asarray(rng.normal(0.0, 2.5e-3, size=(batch, 3, 3)))
    grad_u_prev = jnp.zeros((batch, 3, 3))
    xi_prev = jnp.zeros((batch, model.num_dofs))

    step_single = make_batched_return_map(model, specialize=True)
    xi_s, sigma_s = step_single(xi_prev, grad_u, grad_u_prev,
                                params.values)

    mesh = element_mesh()
    step_sharded = make_sharded_return_map(model, mesh, specialize=True)
    shard = shard_points(mesh)
    xi_m = jax.device_put(xi_prev, shard)
    gu_m = jax.device_put(grad_u, shard)
    gu0_m = jax.device_put(grad_u_prev, shard)
    pv_m = jax.device_put(params.values, replicated(mesh))
    xi_p, sigma_p = step_sharded(xi_m, gu_m, gu0_m, pv_m)

    assert (np.asarray(xi_s[:, 6]) > 0).any()  # plastic points exist
    np.testing.assert_allclose(np.asarray(xi_p), np.asarray(xi_s),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(sigma_p), np.asarray(sigma_s),
                               rtol=1e-12, atol=1e-13)
