"""IO-layer units: deck normalization, schema errors, expression
sandboxing, registry, deformation loading, results component order,
gmsh parsing.

Mirrors the reference tests/io intent.
"""
from __future__ import annotations

import warnings

import numpy as np
import pytest

from cmad_tpu.io.deck import (
    apply_deck_defaults,
    strip_calibr8_only,
    unwrap_top_level,
)
from cmad_tpu.io.deformation import load_history
from cmad_tpu.io.expressions import ExpressionError, parse_scalar_expression
from cmad_tpu.io.registry import (
    registered_model_names,
    registered_qoi_names,
    resolve_global_residual,
    resolve_model,
    resolve_qoi,
)
from cmad_tpu.io.results import (
    component_names,
    from_exodus_storage,
    to_exodus_storage,
)
from cmad_tpu.io.schema import validate_deck
from cmad_tpu.models.var_types import VarType


def test_unwrap_top_level():
    deck = {"my_problem": {"problem": {"type": "material_point"}}}
    assert unwrap_top_level(deck) == {"problem": {"type": "material_point"}}
    flat = {"problem": {"type": "fe"}, "other": 1}
    assert unwrap_top_level(flat) is flat


def test_strip_calibr8_only_warns():
    deck = {"problem": {}, "linear algebra": {}, "regression": {}}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = strip_calibr8_only(deck)
    assert "linear algebra" not in out and "regression" not in out
    assert len(w) == 2


def test_apply_deck_defaults_mp():
    deck = {"problem": {"type": "material_point"}, "output": {"path": "x"}}
    out = apply_deck_defaults(deck)
    assert out["solver"]["newton"]["max_iters"] == 10
    assert out["output"]["format"] == "npy"
    assert deck.get("solver") is None  # input untouched


def test_validate_deck_unknown_pair():
    with pytest.raises(ValueError, match="unknown"):
        validate_deck({"problem": {"type": "material_point"}}, "nonsense")


def test_expression_sandbox_rejects_imports():
    with pytest.raises(ExpressionError):
        parse_scalar_expression("__import__('os').system('true')",
                                ("x", "y", "z", "t"))
    with pytest.raises(ExpressionError):
        parse_scalar_expression("open('/etc/passwd')", ("x",))
    with pytest.raises(ExpressionError):
        parse_scalar_expression("q + 1", ("x",))  # unknown name


def test_expression_evaluates_jax():
    import jax.numpy as jnp

    fn = parse_scalar_expression("sin(pi * x) * t", ("x", "y", "z", "t"))
    out = fn(x=jnp.asarray(0.5), y=0.0, z=0.0, t=2.0)
    assert np.isclose(float(out), 2.0)
    const = parse_scalar_expression(3, ("x",))
    assert const(x=1.0) == 3.0


def test_registry_resolution():
    assert resolve_model("elastic").__name__ == "Elastic"
    assert resolve_model("small_rate_elastic_plastic").__name__ \
        == "SmallRateElasticPlastic"
    assert resolve_qoi("calibration").__name__ == "Calibration"
    assert resolve_qoi("fe_load_match").problem_type == "fe"
    assert resolve_global_residual("small_disp_equilibrium")
    # schema-fragment discovery works without import side effects
    assert "small_elastic_plastic" in registered_model_names()
    assert "fe_weighted_sum" in registered_qoi_names()


def test_deformation_loader_shapes(tmp_path):
    F = np.random.RandomState(0).normal(size=(3, 3, 7))
    np.save(tmp_path / "f.npy", F)
    out = load_history({"history_file": str(tmp_path / "f.npy")}, 3)
    assert np.allclose(out, F)

    # (N, n, n) canonicalizes
    np.save(tmp_path / "f2.npy", F.transpose(2, 0, 1))
    out2 = load_history({"history_file": str(tmp_path / "f2.npy")}, 3)
    assert np.allclose(out2, F)

    # text rows of flattened matrices
    flat = F.transpose(2, 0, 1).reshape(7, 9)
    np.savetxt(tmp_path / "f.txt", flat)
    out3 = load_history({"history_file": str(tmp_path / "f.txt")}, 3)
    assert np.allclose(out3, F)

    with pytest.raises(ValueError, match="ndims"):
        load_history({"history_file": str(tmp_path / "f.npy")}, 2)


def test_results_component_order():
    names = component_names("cauchy", VarType.SYM_TENSOR)
    assert names == ("cauchy_xx", "cauchy_yy", "cauchy_zz",
                     "cauchy_xy", "cauchy_xz", "cauchy_yz")
    internal = np.arange(6.0)
    disk = to_exodus_storage(internal, VarType.SYM_TENSOR)
    assert np.allclose(disk, [0, 3, 5, 1, 2, 4])
    assert np.allclose(from_exodus_storage(disk, VarType.SYM_TENSOR),
                       internal)


def test_gmsh_v41_round_trip(tmp_path):
    """Write a minimal msh 4.1 one-tet file and parse it."""
    msh = """$MeshFormat
4.1 0 8
$EndMeshFormat
$PhysicalNames
2
2 1 "loaded"
3 2 "body"
$EndPhysicalNames
$Entities
0 0 1 1
1 0 0 0 1 1 1 1 1
1 0 0 0 1 1 1 1 2 1 1
$EndEntities
$Nodes
1 4 1 4
3 1 0 4
1
2
3
4
0 0 0
1 0 0
0 1 0
0 0 1
$EndNodes
$Elements
2 2 1 2
2 1 2 1
1 1 2 4
3 1 4 1
2 1 2 3 4
$EndElements
"""
    path = tmp_path / "one.msh"
    path.write_text(msh)
    from cmad_tpu.io.gmsh import read_mesh
    mesh = read_mesh(path)
    assert mesh.nodes.shape == (4, 3)
    assert mesh.connectivity.shape == (1, 4)
    assert "body" in mesh.element_blocks
    assert "loaded" in mesh.side_sets
    elem, face = mesh.side_sets["loaded"][0]
    # nodes (1, 2, 4) 1-based -> {0, 1, 3} = tet face 0 (-y)
    assert (elem, face) == (0, 0)
