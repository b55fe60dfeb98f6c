"""Elastic-constant conversions: every supported pair round-trips."""
from __future__ import annotations

import numpy as np
import pytest

from cmad_tpu.models.elastic_constants import ElasticConstants

E, nu = 70e3, 0.3
_REF = ElasticConstants.from_params({"E": E, "nu": nu})
mu, kappa, lmbda = float(_REF.mu), float(_REF.kappa), float(_REF.lmbda)

PAIRS = [
    {"lambda": lmbda, "mu": mu},
    {"E": E, "nu": nu},
    {"mu": mu, "kappa": kappa},
    {"E": E, "mu": mu},
    {"E": E, "kappa": kappa},
    {"mu": mu, "nu": nu},
    {"kappa": kappa, "nu": nu},
    {"lambda": lmbda, "nu": nu},
    {"lambda": lmbda, "kappa": kappa},
    {"E": E, "lambda": lmbda},
]


@pytest.mark.parametrize("pair", PAIRS, ids=lambda p: "+".join(sorted(p)))
def test_pair_round_trip(pair):
    ec = ElasticConstants.from_params(pair)
    assert np.isclose(float(ec.mu), mu)
    assert np.isclose(float(ec.lmbda), lmbda)
    assert np.isclose(float(ec.kappa), kappa)
    assert np.isclose(float(ec.E), E)
    assert np.isclose(float(ec.nu), nu)


def test_wrong_arity_raises():
    with pytest.raises(ValueError):
        ElasticConstants.from_params({"E": E})
    with pytest.raises(ValueError):
        ElasticConstants.from_params({"E": E, "nu": nu, "mu": mu})
