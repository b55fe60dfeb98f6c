"""Shared analytic test problems (J2/Hill/Hosford + Voce).

Mirrors the intent of the reference's ``tests/support/test_problems.py``:
a J2-with-Voce analytic problem whose Hill and Hosford parameterizations
coincide with J2 on the stress paths used by the tests.
"""
from __future__ import annotations

import numpy as np
from jax.tree_util import tree_map

from cmad_tpu.parameters.parameters import Parameters
from cmad_tpu.verification.functions import J2_yield, J2_yield_normal
from cmad_tpu.verification.solutions import compute_plastic_fields

_IDENTITY_ROT = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]


def _all_false(tree):
    return tree_map(lambda _: False, tree)


def _all_none(tree):
    return tree_map(lambda _: None, tree)


def _make_parameters(effective_stress_params, flat_param_values,
                     scale_params):
    E, nu, Y, S, D = flat_param_values
    values = {
        "rotation matrix": np.eye(3),
        "elastic": {"E": E, "nu": nu},
        "plastic": {
            "effective stress": effective_stress_params,
            "flow stress": {
                "initial yield": {"Y": Y},
                "hardening": {"voce": {"S": S, "D": D}}}}}

    flags = _all_false(values)
    flags["plastic"]["flow stress"] = tree_map(
        lambda _: True, flags["plastic"]["flow stress"])

    transforms = _all_none(values)
    if scale_params:
        fs = transforms["plastic"]["flow stress"]
        fs["initial yield"]["Y"] = [200.0]
        fs["hardening"]["voce"]["S"] = [100.0, 300.0]
        fs["hardening"]["voce"]["D"] = [10.0, 30.0]

    return Parameters(values, flags, transforms)


def params_J2_voce(flat_param_values, scale_params=True):
    """(J2, J2-equivalent-Hill, Hosford-a4) Parameters triples."""
    J2_params = _make_parameters({"J2": 0.0}, flat_param_values, scale_params)
    hill = {"hill": {k: 0.5 for k in ("F", "G", "H", "L", "M", "N")}}
    hill_params = _make_parameters(hill, flat_param_values, scale_params)
    hosford_params = _make_parameters(
        {"hosford": {"a": 4.0}}, flat_param_values, scale_params)
    return J2_params, hill_params, hosford_params


def params_hyperelastic(flat_param_values):
    kappa, mu = flat_param_values
    values = {"elastic": {"kappa": kappa, "mu": mu}}
    flags = {"elastic": {"kappa": True, "mu": True}}
    transforms = {"elastic": {"kappa": [1.0], "mu": [1.0]}}
    return Parameters(values, flags, transforms)


class J2AnalyticalProblem:
    """J2 (or J2-equivalent Hill / Hosford) + Voce analytic problem."""

    def __init__(self, scale_params: bool = True):
        # E, nu, Y, S, D
        self._flat_param_values = np.array([200e3, 0.3, 200.0, 200.0, 20.0])
        (self.J2_parameters, self.hill_parameters,
         self.hosford_parameters) = params_J2_voce(
            self._flat_param_values, scale_params)

    def analytical_solution(self, stress_mask, max_alpha, num_steps):
        return compute_plastic_fields(
            stress_mask, J2_yield, J2_yield_normal,
            self._flat_param_values, max_alpha, num_steps)
