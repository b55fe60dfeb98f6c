"""Boundary-reaction FE QoI: match a measured load, or write the computed
reaction series.

Parity: reference ``cmad/qois/fe_load_match.py``. The reaction is the
global residual summed over the sideset's Dirichlet-prescribed dofs (the
consistent nodal reaction); it depends on parameters directly through the
assembly, so the closure captures ``params_by_block``.
"""
from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any, ClassVar

import jax.numpy as jnp
import numpy as np

from cmad_tpu import config
from cmad_tpu.io.qoi_data import load_reaction_data
from cmad_tpu.io.registry import register_qoi
from cmad_tpu.qois.fe_qoi import FEQoI, StepContribution
from cmad_tpu.typing import Params


@register_qoi("fe_load_match")
class FELoadMatch(FEQoI):
    problem_type: ClassVar[str] = "fe"

    def __init__(self, fe_problem, t_schedule: Sequence[float],
                 sideset: str, components: Sequence[int],
                 data=None, output_file: str | None = None,
                 weight: float = 1.0) -> None:
        comps = [int(c) for c in components]
        dtype = config.real_dtype()
        self._fe_problem = fe_problem
        self._eq_per_component = [
            jnp.asarray(fe_problem.dof_map.dirichlet_eqs_for_component(
                sideset, "u", c)) for c in comps]
        self._t_schedule = jnp.asarray(list(t_schedule), dtype=dtype)
        self._norm = float(weight) / (float(t_schedule[-1])
                                      - float(t_schedule[0]))
        self._output_file = output_file
        if data is None:
            self._data = None
        else:
            data = jnp.asarray(data, dtype=dtype)
            if data.ndim == 1 and len(comps) == 1:
                data = data.reshape(-1, 1)
            expected = (len(t_schedule), len(comps))
            if data.shape != expected:
                raise ValueError(
                    f"FELoadMatch: data shape {tuple(data.shape)} != "
                    f"{expected}")
            self._data = data

    @classmethod
    def from_deck(cls, qoi_section: dict[str, Any], fe_problem,
                  t_schedule) -> "FELoadMatch":
        sideset = qoi_section["sideset"]
        components = qoi_section["components"]
        if "data_file" in qoi_section:
            return cls(fe_problem, t_schedule, sideset, components,
                       data=load_reaction_data(qoi_section),
                       weight=float(qoi_section.get("weight", 1.0)))
        return cls(fe_problem, t_schedule, sideset, components,
                   output_file=qoi_section["output_file"])

    def _reaction_at(self, params_by_block, fe_arrays, U, U_prev, t,
                     xi_prev):
        from cmad_tpu.fem.assembly import assemble_global_residual

        R = assemble_global_residual(
            self._fe_problem, fe_arrays, params_by_block, U, U_prev, t,
            xi_prev_by_block=xi_prev)
        return jnp.stack([jnp.sum(R[eq])
                          for eq in self._eq_per_component])

    def step_contribution(self, params_by_block: Mapping[str, Params],
                          fe_arrays) -> StepContribution:
        if self._data is None:
            raise ValueError(
                "fe_load_match in write mode (output_file) has no "
                "objective; use it under cmad primal")
        data, t_schedule, norm = self._data, self._t_schedule, self._norm

        def closure(U, U_prev, xi, xi_prev, t, t_prev):
            dt = t - t_prev
            step = jnp.argmin(jnp.abs(t_schedule - t))
            reaction = self._reaction_at(params_by_block, fe_arrays, U,
                                         U_prev, t, xi_prev)
            return norm * dt * jnp.sum((reaction - data[step]) ** 2)

        return closure

    def produces_primal_output(self) -> bool:
        return self._output_file is not None

    def write_primal_outputs(self, fe_problem, fe_state) -> None:
        from cmad_tpu.fem.assembly import params_by_block_from_models
        from cmad_tpu.global_residuals.modes import GlobalResidualMode

        assert self._output_file is not None
        params = params_by_block_from_models(fe_problem)
        fe_arrays = fe_problem.kernel_arrays
        coupled = [b for b, m in fe_problem.modes_by_block.items()
                   if m == GlobalResidualMode.COUPLED]
        n = len(fe_state.t_history)
        series = np.zeros((n, len(self._eq_per_component)))
        for k in range(n):
            kp = max(k - 1, 0)
            series[k] = np.asarray(self._reaction_at(
                params, fe_arrays, jnp.asarray(fe_state.U_at(k)),
                jnp.asarray(fe_state.U_at(kp)),
                float(fe_state.t_history[k]),
                {b: jnp.asarray(fe_state.xi_at(kp, b)) for b in coupled}))
        np.savetxt(self._output_file, series, delimiter=",")
