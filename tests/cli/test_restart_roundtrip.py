"""CLI checkpoint/restart round-trip: a primal run that resumes from a
written restart.npz reproduces the straight-through trajectory.

A capability beyond the reference (SURVEY.md section 5 records
checkpoint/resume as absent there); exactness is possible because the
checkpoint stores the raw per-IP state, not the IP-averaged Exodus
output.
"""
from __future__ import annotations

import numpy as np
import pytest

from cmad_tpu.cli.main import main as cmad_main
from cmad_tpu.fem.mesh import StructuredHexMesh
from cmad_tpu.io.exodus import ExodusWriter, read_results
from cmad_tpu.io.restart import read_restart, write_restart
from cmad_tpu.io.results import FieldSpec
from cmad_tpu.models.var_types import VarType

from tests.cli.test_fe_roundtrips import _plastic_deck, _write


@pytest.fixture
def cube_exo(tmp_path):
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    path = tmp_path / "cube.exo"
    ExodusWriter(path, mesh).close()
    return path


def _final_fields(out_dir):
    res = read_results(
        out_dir / "cube_fe.exo",
        nodal_field_specs=[FieldSpec("u", VarType.VECTOR)],
        element_field_specs=[FieldSpec("cauchy", VarType.SYM_TENSOR)])
    return (np.asarray(res.nodal["u"][-1]),
            np.asarray(res.element["cauchy"]["all"][-1]))


def test_restart_reproduces_straight_run(tmp_path, cube_exo):
    # straight 4-step control
    out_full = tmp_path / "full"
    deck = _plastic_deck(cube_exo, out_full)
    assert cmad_main(["primal", str(_write(tmp_path, deck,
                                           "full.yaml"))]) == 0
    u_full, cauchy_full = _final_fields(out_full)

    # first half with a checkpoint
    out_a = tmp_path / "half"
    deck_a = _plastic_deck(cube_exo, out_a)
    deck_a["discretization"]["num steps"] = 2
    deck_a["output"]["write restart"] = True
    assert cmad_main(["primal", str(_write(tmp_path, deck_a,
                                           "half.yaml"))]) == 0
    ckpt = out_a / "restart.npz"
    assert ckpt.exists()
    U0, xi0, t0 = read_restart(ckpt)
    assert np.isclose(t0, 0.5)
    assert set(xi0) == {"all"}

    # second half resumed from the checkpoint
    out_b = tmp_path / "resumed"
    deck_b = _plastic_deck(cube_exo, out_b)
    deck_b["restart"] = {"file": str(ckpt)}
    assert cmad_main(["primal", str(_write(tmp_path, deck_b,
                                           "resume.yaml"))]) == 0
    u_res, cauchy_res = _final_fields(out_b)

    np.testing.assert_allclose(u_res, u_full, rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(cauchy_res, cauchy_full, rtol=1e-9,
                               atol=1e-9)


def test_restart_error_paths(tmp_path, cube_exo):
    deck = _plastic_deck(cube_exo, tmp_path / "out")
    deck["restart"] = {"file": str(tmp_path / "ghost.npz")}
    with pytest.raises(FileNotFoundError, match="ghost.npz"):
        cmad_main(["primal", str(_write(tmp_path, deck, "bad.yaml"))])

    # checkpoint at/after the final schedule time
    n_dofs = 27 * 3
    write_restart(tmp_path / "late.npz", np.zeros(n_dofs),
                  {"all": np.zeros((8, 8, 7))}, t=1.0)
    deck["restart"] = {"file": str(tmp_path / "late.npz")}
    with pytest.raises(ValueError, match="nothing to solve"):
        cmad_main(["primal", str(_write(tmp_path, deck, "late.yaml"))])

    # wrong mesh size
    write_restart(tmp_path / "wrong.npz", np.zeros(12),
                  {"all": np.zeros((8, 8, 7))}, t=0.25)
    deck["restart"] = {"file": str(tmp_path / "wrong.npz")}
    with pytest.raises(ValueError, match="dofs"):
        cmad_main(["primal", str(_write(tmp_path, deck, "wrong.yaml"))])

    # wrong block name
    write_restart(tmp_path / "blocks.npz", np.zeros(n_dofs),
                  {"steel": np.zeros((8, 8, 7))}, t=0.25)
    deck["restart"] = {"file": str(tmp_path / "blocks.npz")}
    with pytest.raises(ValueError, match="blocks"):
        cmad_main(["primal", str(_write(tmp_path, deck, "blocks.yaml"))])


def test_restart_rejected_outside_primal(tmp_path, cube_exo):
    deck = _plastic_deck(cube_exo, tmp_path / "out")
    deck["qoi"] = {"name": "fe_displacement_l2"}
    deck["restart"] = {"file": "whatever.npz"}
    with pytest.raises(ValueError, match="restart"):
        cmad_main(["objective", str(_write(tmp_path, deck,
                                           "obj.yaml"))])
