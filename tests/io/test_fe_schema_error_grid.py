"""FE deck schema validation: one error-path probe per section/fragment.

Deepens the io permutation coverage (reference pattern:
``tests/io/test_schema.py``): every mutation of a valid FE primal deck
must be rejected with an error message that names the offending deck
path, and the valid decks must pass for their subcommand.
"""
from __future__ import annotations

import copy
from pathlib import Path

import pytest
import yaml

from cmad_tpu.io.deck import apply_deck_defaults
from cmad_tpu.io.schema import validate_deck

_EXAMPLES = Path("/root/repo/examples")


def _fe_deck():
    deck = yaml.safe_load(
        (_EXAMPLES / "elastic_plastic_uniaxial.yaml").read_text())
    return copy.deepcopy(deck)


def _mixed_deck():
    return yaml.safe_load((_EXAMPLES / "mixed_plastic.yaml").read_text())


def test_fe_primal_examples_validate():
    validate_deck(apply_deck_defaults(_fe_deck()), "primal")
    validate_deck(apply_deck_defaults(_mixed_deck()), "primal")


def _set(deck, path, value):
    node = deck
    for key in path[:-1]:
        node = node[key]
    node[path[-1]] = value
    return deck


def _delete(deck, path):
    node = deck
    for key in path[:-1]:
        node = node[key]
    del node[path[-1]]
    return deck


_CASES = [
    # problem fragment
    ("problem-bad-type",
     lambda d: _set(d, ["problem", "type"], "spectral"), "problem"),
    ("problem-extra-key",
     lambda d: _set(d, ["problem", "gpu_count"], 4), "problem"),
    # discretization fragment
    ("disc-missing-mesh",
     lambda d: _delete(d, ["discretization", "mesh file"]),
     "discretization"),
    ("disc-bad-num-steps",
     lambda d: _set(d, ["discretization", "num steps"], -3),
     "discretization"),
    ("disc-bad-step-size",
     lambda d: _set(d, ["discretization", "step size"], "big"),
     "discretization"),
    # residuals fragment
    ("gr-unknown-type",
     lambda d: _set(d, ["residuals", "global residual", "type"],
                    "peridynamics"), "global residual"),
    ("gr-bad-def-type",
     lambda d: _set(d, ["residuals", "global residual", "def_type"],
                    "full_4d"), "residuals"),
    ("lr-unknown-model",
     lambda d: _set(d, ["residuals", "local residual", "type"],
                    "crystal_plasticity_9000"), "local residual"),
    ("lr-missing-materials",
     lambda d: _delete(d, ["residuals", "local residual", "materials"]),
     "residuals"),
    # dirichlet bcs fragment
    ("dbc-bad-shape",
     lambda d: _set(d, ["dirichlet bcs", "expression", "pin_x"],
                    ["equilibrium", 0]), "dirichlet"),
    ("dbc-bad-component",
     lambda d: _set(d, ["dirichlet bcs", "expression", "pin_x"],
                    ["equilibrium", "x", "xmin_sides", "0.0"]),
     "dirichlet"),
    # linear solver fragment
    ("ls-bad-type",
     lambda d: _set(d, ["linear solver"], {"type": "multifrontal"}),
     "linear solver"),
    ("ls-bad-rtol",
     lambda d: _set(d, ["linear solver"],
                    {"type": "cg", "rtol": -1.0}), "linear solver"),
    ("ls-bad-precon",
     lambda d: _set(d, ["linear solver"],
                    {"type": "cg",
                     "preconditioner": {"type": "ilu0"}}),
     "linear solver"),
    ("ls-bad-smoother",
     lambda d: _set(d, ["linear solver"],
                    {"type": "gmres",
                     "preconditioner": {"type": "two_level",
                                        "smoother": "ilu"}}),
     "linear solver"),
    ("ls-bad-solve-dtype",
     lambda d: _set(d, ["linear solver"],
                    {"type": "cg", "solve dtype": "f16"}),
     "linear solver"),
    # output fragment
    ("output-bad-extra",
     lambda d: _set(d, ["output", "upload_to"], "s3://bucket"),
     "output"),
    # subcommand restriction: primal must not carry sensitivity
    ("primal-rejects-sensitivity",
     lambda d: _set(d, ["sensitivity"], {"strategy": "jvp"}),
     "sensitivity"),
]


@pytest.mark.parametrize("name,mutate,needle",
                         _CASES, ids=[c[0] for c in _CASES])
def test_fe_deck_mutation_rejected(name, mutate, needle):
    deck = apply_deck_defaults(mutate(_fe_deck()))
    with pytest.raises(ValueError) as e:
        validate_deck(deck, "primal")
    assert needle in str(e.value)


def test_surface_flux_fragment_rejects_bad_entry():
    deck = _fe_deck()
    deck["surface flux bcs"] = {"expression": {"load": ["u"]}}
    with pytest.raises(ValueError, match="surface flux"):
        validate_deck(apply_deck_defaults(deck), "primal")


def test_body_forces_fragment_rejects_bad_entry():
    deck = _fe_deck()
    deck["body forces"] = {"b": "not-a-component-list"}
    with pytest.raises(ValueError, match="body force"):
        validate_deck(apply_deck_defaults(deck), "primal")


def test_two_time_specs_simultaneously_error():
    deck = _fe_deck()
    deck["discretization"]["times"] = [0.0, 1.0]
    with pytest.raises(ValueError, match="discretization"):
        validate_deck(apply_deck_defaults(deck), "primal")


def test_no_time_spec_errors():
    deck = _fe_deck()
    deck["discretization"].pop("num steps", None)
    deck["discretization"].pop("step size", None)
    with pytest.raises(ValueError, match="discretization"):
        validate_deck(apply_deck_defaults(deck), "primal")


def test_fe_deck_validates_without_output():
    deck = _fe_deck()
    deck.pop("output", None)
    validate_deck(apply_deck_defaults(deck), "primal")


def test_times_file_form_validates():
    deck = _fe_deck()
    deck["discretization"].pop("num steps", None)
    deck["discretization"].pop("step size", None)
    deck["discretization"]["times file"] = "times.npy"
    validate_deck(apply_deck_defaults(deck), "primal")


def test_both_dispatch_caps_rejected_in_deck_terms():
    """'max iters per dispatch' + 'steps per dispatch' together must be
    rejected at deck-resolution time, with the error naming the deck
    keys (not the Python kwargs) — a bad deck must not survive until
    full problem construction."""
    deck = _fe_deck()
    gr = deck["residuals"]["global residual"]
    gr["driver"] = "stepped"
    gr["max iters per dispatch"] = 2
    gr["steps per dispatch"] = 2
    with pytest.raises(ValueError) as err:
        validate_deck(apply_deck_defaults(deck), "primal")
    msg = str(err.value)
    assert "max iters per dispatch" in msg
    assert "steps per dispatch" in msg
    assert "max_iters_per_dispatch" not in msg


@pytest.mark.parametrize("cap_key", ["max iters per dispatch",
                                     "steps per dispatch"])
@pytest.mark.parametrize("driver", [None, "scan", "host"])
def test_dispatch_cap_requires_stepped_driver(cap_key, driver):
    """A per-dispatch cap on a non-stepped driver would be silently
    ignored; the deck must be rejected with guidance naming the key
    and the stepped driver."""
    deck = _fe_deck()
    gr = deck["residuals"]["global residual"]
    if driver is not None:
        gr["driver"] = driver
    else:
        gr.pop("driver", None)
    gr[cap_key] = 2
    with pytest.raises(ValueError) as err:
        validate_deck(apply_deck_defaults(deck), "primal")
    msg = str(err.value)
    assert cap_key in msg
    assert "stepped" in msg


@pytest.mark.parametrize("cap_key", ["max iters per dispatch",
                                     "steps per dispatch"])
def test_dispatch_cap_with_stepped_driver_validates(cap_key):
    deck = _fe_deck()
    gr = deck["residuals"]["global residual"]
    gr["driver"] = "stepped"
    gr[cap_key] = 2
    validate_deck(apply_deck_defaults(deck), "primal")
