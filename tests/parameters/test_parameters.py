"""Parameters container: transform round-trips, active indexing, chain rules.

Mirrors reference ``tests/parameters/`` plus AD cross-checks of the
vectorized transform machinery.
"""
from __future__ import annotations

import jax
import numpy as np

from cmad_tpu.parameters.parameters import Parameters

from tests.support.problems import J2AnalyticalProblem


def _make_problem_params():
    return J2AnalyticalProblem(scale_params=True).J2_parameters


def test_active_indexing():
    p = _make_problem_params()
    # active: Y, S, D (flow stress subtree)
    assert p.num_active_params == 3
    active = p.flat_active_values()
    assert np.allclose(sorted(active), sorted([200.0, 200.0, 20.0]))


def test_canonical_round_trip():
    p = _make_problem_params()
    canonical = p.flat_active_values(return_canonical=True)
    physical = np.asarray(p.physical_from_canonical_active(canonical))
    assert np.allclose(physical, p.flat_active_values())


def test_set_active_values_from_flat():
    p = _make_problem_params()
    canonical = p.flat_active_values(return_canonical=True)
    p.set_active_values_from_flat(canonical * 0.5 + 0.1)
    updated = p.flat_active_values(return_canonical=True)
    assert np.allclose(updated, canonical * 0.5 + 0.1)


def test_tree_with_flat_active_matches_host_path():
    p = _make_problem_params()
    canonical = p.flat_active_values(return_canonical=True) + 0.05
    tree = p.tree_with_flat_active(canonical, canonical=True)
    p2 = _make_problem_params()
    p2.set_active_values_from_flat(canonical)
    flat1 = jax.flatten_util.ravel_pytree(tree)[0]
    flat2 = jax.flatten_util.ravel_pytree(p2.values)[0]
    assert np.allclose(np.asarray(flat1), np.asarray(flat2))


def test_transform_grad_matches_ad():
    """The vectorized post-hoc chain rule must agree with differentiating
    through the traced canonical->physical map."""
    p = _make_problem_params()
    canonical = p.flat_active_values(return_canonical=True)

    def f_of_canonical(a):
        phys = p.physical_from_canonical_active(a)
        return (phys**2).sum() + (phys**3).sum() * 0.1

    def f_of_physical(v):
        return (v**2).sum() + (v**3).sum() * 0.1

    g_phys = np.asarray(jax.grad(f_of_physical)(
        jax.numpy.asarray(p.flat_active_values())))
    g_expected = np.asarray(jax.grad(f_of_canonical)(
        jax.numpy.asarray(canonical)))
    assert np.allclose(p.transform_grad(g_phys), g_expected)

    H_phys = np.asarray(jax.hessian(f_of_physical)(
        jax.numpy.asarray(p.flat_active_values())))
    H_expected = np.asarray(jax.hessian(f_of_canonical)(
        jax.numpy.asarray(canonical)))
    assert np.allclose(p.transform_hessian(H_phys, g_phys), H_expected)


def test_array_leaf_expansion():
    """An array leaf shares one active flag and transform across elements."""
    values = {"w": np.ones((2, 3)), "b": 2.0}
    flags = {"w": True, "b": False}
    transforms = {"w": None, "b": None}
    p = Parameters(values, flags, transforms)
    assert p.num_params == 7
    assert p.num_active_params == 6


def test_opt_bounds():
    p = _make_problem_params()
    # Y is log-transformed (unbounded), S and D bounds-transformed
    kinds = [tuple(b) for b in p.opt_bounds]
    assert kinds.count((-1.0, 1.0)) == 2
    assert kinds.count((None, None)) == 1
