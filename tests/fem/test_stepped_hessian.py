"""Stepped FE Hessian == fused-scan Hessian.

The stepped path (``fem/stepped_adjoint.py build_fe_stepped_hvp``)
computes ``H @ v`` by per-step forward-over-reverse — a tangent
forward sweep (jvp of each step) and a tangent reverse sweep (jvp over
the vjp of each RE-SOLVING step) — and must agree with
``jax.hessian`` of the fused scan trajectory
(``cli/fe_subcommands.py run_hessian_fe``, matching reference
``cmad/cli/hessian.py:44``) to AD/solver precision.
"""
from __future__ import annotations

import numpy as np
import pytest

from cmad_tpu.cli.main import main as cmad_main

from tests.fem.test_stepped_adjoint import (  # noqa: F401  (fixtures)
    _sensitivity_deck,
    _write,
    cube_exo,
    truth_data,
)


def test_stepped_hessian_matches_scan(tmp_path, cube_exo, truth_data):
    hess = {}
    for driver in ("scan", "stepped"):
        out = tmp_path / f"hess_{driver}"
        deck = _sensitivity_deck(tmp_path, cube_exo, truth_data, out,
                                 driver)
        deck_path = _write(tmp_path, deck, f"deck_hess_{driver}.yaml")
        assert cmad_main(["hessian", str(deck_path)]) == 0
        hess[driver] = np.load(out / "hess.npy")

    assert hess["scan"].shape == hess["stepped"].shape == (2, 2)
    assert np.linalg.norm(hess["scan"]) > 0.0
    # same second derivatives, different dispatch granularity
    np.testing.assert_allclose(hess["stepped"], hess["scan"],
                               rtol=5e-4, atol=1e-9 * np.abs(
                                   hess["scan"]).max())


def test_hvp_consistency_and_columns(tmp_path, cube_exo, truth_data):
    """Library surface: J_dot from the tangent forward sweep equals
    grad @ v (two independent computations of the directional
    derivative), the gradient riding along the HVP matches the
    stepped value_and_grad, and H is symmetric to float noise."""
    import os
    from pathlib import Path

    import jax.numpy as jnp

    from cmad_tpu.cli.fe_common import (
        build_fe_problem_from_deck,
        fe_params_overlay,
    )
    from cmad_tpu.fem.fe_problem import FEState
    from cmad_tpu.fem.stepped_adjoint import (
        build_fe_stepped_hvp,
        build_fe_stepped_value_and_grad,
    )

    deck = _sensitivity_deck(tmp_path, cube_exo, truth_data,
                             tmp_path / "out_hvp", "stepped")
    deck_path = _write(tmp_path, deck, "deck_hvp.yaml")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        bundle = build_fe_problem_from_deck(Path("deck_hvp.yaml"),
                                            "gradient")
    finally:
        os.chdir(cwd)
    fe = bundle.fe_problem
    params_flat, overlay = fe_params_overlay(fe)
    st = FEState.from_problem(fe)
    state_init = (jnp.asarray(st.U_at(0)),
                  {b: jnp.asarray(st.xi_at(0, b))
                   for b in fe.models_by_block})
    for t in bundle.t_schedule[1:]:
        fe.dof_map.evaluate_prescribed_values(
            fe.kernel_arrays.dbc_arrays, float(t))

    hvp = build_fe_stepped_hvp(fe, overlay, bundle.qoi)
    vg = build_fe_stepped_value_and_grad(fe, overlay, bundle.qoi)
    J_ref, g_ref = vg(params_flat, state_init, bundle.t_schedule)

    v = np.asarray([0.7, -0.3])
    (J, grad, hv), J_dot = hvp._with_jdot(params_flat, state_init,
                                          bundle.t_schedule, v)
    assert np.isclose(J, J_ref, rtol=1e-10)
    np.testing.assert_allclose(grad, g_ref, rtol=1e-6)
    # directional derivative two ways
    assert np.isclose(J_dot, float(grad @ v), rtol=1e-5), \
        (J_dot, float(grad @ v))
    assert np.linalg.norm(hv) > 0.0

    # symmetry across two unit columns
    _, _, h0 = hvp(params_flat, state_init, bundle.t_schedule,
                   np.array([1.0, 0.0]))
    _, _, h1 = hvp(params_flat, state_init, bundle.t_schedule,
                   np.array([0.0, 1.0]))
    assert np.isclose(h0[1], h1[0], rtol=1e-4), (h0, h1)
    # linearity: H(0.7 e0 - 0.3 e1) from the columns
    np.testing.assert_allclose(hv, 0.7 * h0 - 0.3 * h1, rtol=1e-4)
