"""FE-side QoI contract: per-step closure factory.

Parity: reference ``cmad/qois/fe_qoi.py``. An FE QoI builds a per-step
closure ``(U, U_prev, xi, xi_prev, t, t_prev) -> J_n`` via
``step_contribution(params_by_block, fe_arrays)``; the trajectory scan
accumulates the increments into J. QoIs that emit primal-side files
instead of objectives override ``produces_primal_output`` /
``write_primal_outputs``.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from collections.abc import Callable, Mapping, Sequence
from typing import TYPE_CHECKING, Any, ClassVar

from cmad_tpu.qois.qoi_base import QoIBase
from cmad_tpu.typing import JaxArray, Params

if TYPE_CHECKING:
    from cmad_tpu.fem.fe_problem import FEProblem, FEState
    from cmad_tpu.fem.kernel_arrays import FEKernelArrays

# (U, U_prev, xi, xi_prev, t, t_prev) -> scalar step increment
StepContribution = Callable[..., JaxArray]


class FEQoI(QoIBase, ABC):
    problem_type: ClassVar[str] = "fe"

    @abstractmethod
    def step_contribution(self, params_by_block: Mapping[str, Params],
                          fe_arrays: "FEKernelArrays") -> StepContribution:
        ...

    @classmethod
    @abstractmethod
    def from_deck(cls, qoi_section: dict[str, Any],
                  fe_problem: "FEProblem",
                  t_schedule: Sequence[float]) -> "FEQoI":
        ...

    def produces_primal_output(self) -> bool:
        return False

    def write_primal_outputs(self, fe_problem: "FEProblem",
                             fe_state: "FEState") -> None:
        raise NotImplementedError(
            f"{type(self).__name__} does not produce a primal output")
