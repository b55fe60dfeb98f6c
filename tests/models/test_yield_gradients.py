"""Yield-surface gradient (flow normal) FD checks for every family.

The flow normals come from AD of the yield functions; this verifies
each family's AD gradient against central differences and the
structural properties plasticity relies on (deviatoric trace for
pressure-insensitive yields, degree-one homogeneity).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.models.effective_stress import (
    J2_effective_stress,
    barlat_effective_stress,
    hill_effective_stress,
    hosford_effective_stress,
    hybrid_hill_effective_stress,
)
from cmad_tpu.neural_networks.simple_neural_network import (
    SimpleNeuralNetwork,
    forward_with_offset,
)

_BARLAT = {k: v for k, v in zip(
    ("sp_12", "sp_13", "sp_21", "sp_23", "sp_31", "sp_32",
     "sp_44", "sp_55", "sp_66",
     "dp_12", "dp_13", "dp_21", "dp_23", "dp_31", "dp_32",
     "dp_44", "dp_55", "dp_66", "a"),
    (0.9, 1.1, 1.05, 0.95, 1.2, 0.8, 1.0, 1.1, 0.9,
     1.1, 0.9, 0.95, 1.05, 0.85, 1.15, 1.0, 0.9, 1.1, 8.0))}

_HILL = {"F": 0.3, "G": 0.5, "H": 0.6, "L": 1.4, "M": 1.6, "N": 1.7}


_NET = SimpleNeuralNetwork([6, 4, 1], input_scale=0.01,
                           output_scale=10.0)


def _nn_fun(x, nn_params):
    return forward_with_offset(x, nn_params, 0.01, 10.0)


CASES = {
    "J2": (lambda s: J2_effective_stress(s), None),
    "hill": (lambda s: hill_effective_stress(
        s, {"effective stress": {"hill": _HILL}}), None),
    "hosford": (lambda s: hosford_effective_stress(
        s, {"effective stress": {"hosford": {"a": 8.0}}}), None),
    "barlat": (lambda s: barlat_effective_stress(
        s, {"effective stress": {"barlat": _BARLAT}}), None),
    "hybrid_hill": (lambda s: hybrid_hill_effective_stress(
        s, {"effective stress": {"hill": _HILL,
                                 "neural network": _NET.params}},
        _nn_fun), None),
}


def _rand_sym(seed, scale=120.0):
    rng = np.random.RandomState(seed)
    s = rng.normal(size=(3, 3)) * scale
    return jnp.asarray(0.5 * (s + s.T))


@pytest.mark.parametrize("name", list(CASES))
def test_normal_matches_fd(name):
    phi, _ = CASES[name]
    s = _rand_sym(7)
    n = np.asarray(jax.grad(lambda x: phi(x))(s))
    h = 1e-4
    for idx in ((0, 0), (1, 1), (0, 1), (1, 2)):
        e = np.zeros((3, 3))
        e[idx] = h
        fd = (float(phi(s + e)) - float(phi(s - e))) / (2 * h)
        np.testing.assert_allclose(n[idx], fd, rtol=5e-6, atol=1e-8,
                                   err_msg=f"{name} d/ds{idx}")


@pytest.mark.parametrize("name", ["J2", "hill", "hosford", "barlat"])
def test_degree_one_homogeneity(name):
    phi, _ = CASES[name]
    s = _rand_sym(9)
    np.testing.assert_allclose(float(phi(2.5 * s)), 2.5 * float(phi(s)),
                               rtol=1e-9)
    # Euler identity: n : s = phi
    n = jax.grad(lambda x: phi(x))(s)
    np.testing.assert_allclose(float(jnp.sum(n * s)), float(phi(s)),
                               rtol=1e-9)


@pytest.mark.parametrize("name", ["J2", "hosford", "barlat"])
def test_pressure_insensitive_normals_are_deviatoric(name):
    phi, _ = CASES[name]
    s = _rand_sym(11)
    n = np.asarray(jax.grad(lambda x: phi(x))(s))
    np.testing.assert_allclose(np.trace(n), 0.0, atol=1e-9)
    phi_shift = float(phi(s + 50.0 * jnp.eye(3)))
    np.testing.assert_allclose(phi_shift, float(phi(s)), rtol=1e-9)
