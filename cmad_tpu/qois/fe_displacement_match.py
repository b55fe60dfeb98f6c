"""Time- and space-averaged displacement-mismatch FE QoI.

Parity: reference ``cmad/qois/fe_displacement_match.py``:
``J = (w / (T |Omega|)) sum_n dt_n int |u_n - u_data_n|^2 dV``.
"""
from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any, ClassVar

import jax.numpy as jnp

from cmad_tpu import config
from cmad_tpu.io.qoi_data import load_displacement_data
from cmad_tpu.io.registry import register_qoi
from cmad_tpu.qois.fe_displacement_l2 import (
    _displacement_block,
    _total_volume,
)
from cmad_tpu.qois.fe_qoi import FEQoI, StepContribution
from cmad_tpu.typing import Params


@register_qoi("fe_displacement_match")
class FEDisplacementMatch(FEQoI):
    problem_type: ClassVar[str] = "fe"

    def __init__(self, fe_problem, t_schedule: Sequence[float], data,
                 weight: float = 1.0) -> None:
        self._fe_problem = fe_problem
        self._r_disp, self._field_idx = _displacement_block(fe_problem)

        dtype = config.real_dtype()
        num_steps = len(t_schedule)
        data = jnp.asarray(data, dtype=dtype)
        if data.shape[0] != num_steps:
            raise ValueError(
                f"data has {data.shape[0]} steps; schedule has "
                f"{num_steps} (one field per schedule time incl. t0)")
        flat = data.reshape(num_steps, -1)
        n_dofs = fe_problem.dof_map.num_total_dofs
        if flat.shape[1] != n_dofs:
            raise ValueError(
                f"data flattens to {flat.shape[1]} dofs/step; problem has "
                f"{n_dofs} (single-displacement-field problems only)")
        self._data_flat = flat
        self._t_schedule = jnp.asarray(list(t_schedule), dtype=dtype)
        T = float(t_schedule[-1]) - float(t_schedule[0])
        self._norm = float(weight) / (T * _total_volume(fe_problem))

    @classmethod
    def from_deck(cls, qoi_section: dict[str, Any], fe_problem,
                  t_schedule) -> "FEDisplacementMatch":
        return cls(fe_problem, t_schedule,
                   load_displacement_data(qoi_section),
                   weight=float(qoi_section.get("weight", 1.0)))

    def step_contribution(self, params_by_block: Mapping[str, Params],
                          fe_arrays) -> StepContribution:
        del params_by_block
        fe_problem = self._fe_problem
        r, field_idx = self._r_disp, self._field_idx
        norm, data_flat = self._norm, self._data_flat
        t_schedule = self._t_schedule

        blocks = []
        for name in fe_problem.models_by_block:
            geom = fe_arrays.geometry_cache[name]
            blocks.append((name, geom["shared"]["N"][r],
                           geom["per_elem"]["iso_jac_det"]
                           * geom["shared"]["quad_w"][None, :]))

        def closure(U, U_prev, xi, xi_prev, t, t_prev):
            dt = t - t_prev
            step = jnp.argmin(jnp.abs(t_schedule - t))
            diff_global = jnp.asarray(U) - data_flat[step]
            total = jnp.zeros(())
            for name, N, w_dv in blocks:
                gather = fe_arrays.u_gather_eq_by_block[name][field_idx]
                diff_elem = diff_global[gather]
                d_ip = jnp.einsum("pa,eak->epk", N, diff_elem)
                total = total + jnp.sum(
                    jnp.sum(d_ip * d_ip, axis=-1) * w_dv)
            return norm * dt * total

        return closure
