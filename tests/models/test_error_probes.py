"""Error-path probes from the verify recipe, pinned as tests.

Each of these is a user-facing failure mode whose message quality the
recipe checks by hand; pinning them keeps the messages honest.
"""
from __future__ import annotations

import numpy as np
import pytest

from cmad_tpu.models.effective_stress import (
    conventional_effective_stress_fun,
)
from cmad_tpu.models.elastic_constants import ElasticConstants
from cmad_tpu.io.registry import resolve_model
from cmad_tpu.parameters.parameters import Parameters


def test_unknown_yield_name_is_named():
    with pytest.raises(NotImplementedError, match="tresca_exact"):
        conventional_effective_stress_fun("tresca_exact")


def test_single_elastic_constant_lists_valid_names():
    with pytest.raises(ValueError, match="E"):
        ElasticConstants.from_params({"E": 1000.0})


def test_registry_unknown_model_mentions_import():
    with pytest.raises(KeyError) as e:
        resolve_model("quantum_foam")
    assert "quantum_foam" in str(e.value)


def test_transforms_without_active_flags_rejected():
    values = {"a": 1.0}
    transforms = {"a": [0.0, 2.0]}
    with pytest.raises(AssertionError):
        Parameters(values, None, transforms)


def test_out_of_bounds_value_saturates_canonically():
    """A value outside its bounds transform clips to the canonical
    boundary (the optimizer's box [-1, 1] stays valid)."""
    p = Parameters({"a": 5.0}, {"a": True}, {"a": [0.0, 1.0]})
    canon = np.asarray(p.flat_active_values(return_canonical=True))
    np.testing.assert_allclose(canon, 1.0)
    np.testing.assert_array_equal(np.asarray(p.opt_bounds),
                                  [[-1.0, 1.0]])
