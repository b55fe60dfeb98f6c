"""The installed console script and `python -m cmad_tpu` both work."""
from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml


@pytest.fixture
def mp_deck(tmp_path):
    F = np.repeat(np.eye(2)[:, :, None], 4, axis=2)
    F[0, 0, :] += np.r_[0.0, np.linspace(1e-4, 3e-4, 3)]
    np.save(tmp_path / "F.npy", F)
    deck = {
        "problem": {"type": "material_point", "name": "smoke"},
        "model": {"name": "small_rate_elastic_plastic",
                  "def_type": "plane_stress"},
        "parameters": {
            "elastic": {"E": {"value": 200e3}, "nu": {"value": 0.3}},
            "plastic": {
                "effective stress": {"J2": {"value": 0.0}},
                "flow stress": {
                    "initial yield": {"Y": {"value": 200.0}},
                    "hardening": {"voce": {"S": {"value": 200.0},
                                           "D": {"value": 20.0}}}}}},
        "deformation": {"history_file": "F.npy"},
        "solver": {"newton": {}},
        "output": {"path": "out"},
    }
    (tmp_path / "deck.yaml").write_text(yaml.safe_dump(deck))
    return tmp_path


def _run(args, cwd):
    # the subprocess runs from the deck tempdir: put the repo root on
    # PYTHONPATH so `python -m cmad_tpu` resolves without an installed
    # (pip -e) package
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    pythonpath = os.pathsep.join(
        p for p in (repo_root, os.environ.get("PYTHONPATH")) if p)
    env = {**os.environ, "CMAD_X64": "1", "JAX_PLATFORM_NAME": "cpu",
           "PYTHONPATH": pythonpath}
    return subprocess.run(args, cwd=cwd, env=env, capture_output=True,
                          text=True, timeout=300)


def test_python_dash_m_entry(mp_deck):
    r = _run([sys.executable, "-m", "cmad_tpu", "primal", "deck.yaml"],
             mp_deck)
    assert r.returncode == 0, r.stderr[-800:]
    assert (mp_deck / "out" / "cauchy.npy").exists()


def test_usage_error_exits_nonzero(mp_deck):
    r = _run([sys.executable, "-m", "cmad_tpu", "frobnicate",
              "deck.yaml"], mp_deck)
    assert r.returncode != 0
    assert "primal" in (r.stderr + r.stdout)  # usage lists subcommands
