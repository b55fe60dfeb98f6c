"""Time- and space-averaged squared-displacement FE QoI.

Parity: reference ``cmad/qois/fe_displacement_l2.py``:
``J = (1 / (T |Omega|)) sum_n dt_n int |u_n|^2 dV`` with u_0 = 0.
Mixed-field problems work: the closure reads only the ``u`` block.
"""
from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any, ClassVar

import jax.numpy as jnp

from cmad_tpu.fem.precompute import compute_ip_quadrature_weights
from cmad_tpu.io.registry import register_qoi
from cmad_tpu.qois.fe_qoi import FEQoI, StepContribution
from cmad_tpu.typing import Params


def _displacement_block(fe_problem):
    var_names = list(fe_problem.gr.var_names)
    try:
        r = var_names.index("u")
    except ValueError as e:
        raise ValueError(
            f"QoI requires a residual block with var_name 'u'; got "
            f"{var_names}") from e
    return r, fe_problem.field_idx_per_block[r]


def _total_volume(fe_problem) -> float:
    weights = compute_ip_quadrature_weights(fe_problem.geometry_cache)
    return float(sum(a.sum() for a in weights.values()))


@register_qoi("fe_displacement_l2")
class FEDisplacementL2(FEQoI):
    problem_type: ClassVar[str] = "fe"

    def __init__(self, fe_problem, t_schedule: Sequence[float]) -> None:
        self._fe_problem = fe_problem
        self._r_disp, self._field_idx = _displacement_block(fe_problem)
        T = float(t_schedule[-1]) - float(t_schedule[0])
        self._norm = 1.0 / (T * _total_volume(fe_problem))

    @classmethod
    def from_deck(cls, qoi_section: dict[str, Any], fe_problem,
                  t_schedule) -> "FEDisplacementL2":
        return cls(fe_problem, t_schedule)

    def step_contribution(self, params_by_block: Mapping[str, Params],
                          fe_arrays) -> StepContribution:
        del params_by_block  # enters only through the solved state
        fe_problem = self._fe_problem
        r, field_idx = self._r_disp, self._field_idx
        norm = self._norm

        blocks = []
        for name in fe_problem.models_by_block:
            geom = fe_arrays.geometry_cache[name]
            blocks.append((name, geom["shared"]["N"][r],
                           geom["per_elem"]["iso_jac_det"]
                           * geom["shared"]["quad_w"][None, :]))

        def closure(U, U_prev, xi, xi_prev, t, t_prev):
            dt = t - t_prev
            total = jnp.zeros(())
            for name, N, w_dv in blocks:
                gather = fe_arrays.u_gather_eq_by_block[name][field_idx]
                U_elem = jnp.asarray(U)[gather]
                u_ip = jnp.einsum("pa,eak->epk", N, U_elem)
                total = total + jnp.sum(
                    jnp.sum(u_ip * u_ip, axis=-1) * w_dv)
            return norm * dt * total

        return closure
