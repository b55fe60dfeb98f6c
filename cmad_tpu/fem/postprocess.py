"""Derived-quantity evaluation from a converged FE trajectory.

Parity: reference ``cmad/fem/postprocess.py``. Flat per-IP state makes
state-variable extraction a layout slice; cauchy evaluation interpolates
the cached shape values and dispatches on the block's mode (mixed u-p
substitutes the pressure dof for the hydrostatic part).
"""
from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np
from jax import vmap

from cmad_tpu.fem.elements import ShapeFunctionsAtIP
from cmad_tpu.fem.fe_problem import FEProblem, FEState
from cmad_tpu.global_residuals.interpolation import (
    interpolate_global_fields_at_ip,
)
from cmad_tpu.global_residuals.modes import GlobalResidualMode
from cmad_tpu.models.var_types import VarType, vector_from_sym_tensor


def _interp_at_ips(fe_problem, block_name, U_elem, num_blocks, var_names):
    """Per-(elem, ip) GlobalFieldsAtPoint builder pieces."""
    geom = fe_problem.geometry_cache[block_name]
    N = geom["shared"]["N"]
    grads = geom["per_elem"]["grad_N_phys"]
    n_ip = geom["shared"]["quad_w"].shape[0]
    return N, grads, n_ip


def evaluate_cauchy_at_ips(fe_problem: FEProblem, fe_state: FEState,
                           step: int, block_name: str) -> np.ndarray:
    """(n_elems, n_ip, 6) Cauchy stress in internal sym-vec order."""
    U = jnp.asarray(fe_state.U_at(step))
    U_prev = (jnp.asarray(fe_state.U_at(step - 1)) if step > 0
              else jnp.zeros_like(U))
    arrays = fe_problem.kernel_arrays
    gathers = arrays.u_gather_eq_by_block[block_name]
    U_elem = [U[eq] for eq in gathers]
    U_prev_elem = [U_prev[eq] for eq in gathers]
    # select the per-residual-block fields
    U_elem = [U_elem[i] for i in fe_problem.field_idx_per_block]
    U_prev_elem = [U_prev_elem[i] for i in fe_problem.field_idx_per_block]

    model = fe_problem.models_by_block[block_name]
    params = model.parameters.values
    mode = fe_problem.modes_by_block[block_name]
    var_names = fe_problem.gr.var_names
    num_blocks = fe_problem.gr.num_residuals
    is_mixed = getattr(fe_problem.gr, "mixed", False)
    geom = fe_problem.geometry_cache[block_name]
    N_blocks = geom["shared"]["N"]
    coupled = mode == GlobalResidualMode.COUPLED

    if coupled:
        xi = jnp.asarray(fe_state.xi_at(step, block_name))
        xi_prev = (jnp.asarray(fe_state.xi_at(step - 1, block_name))
                   if step > 0 else jnp.zeros_like(xi))
    else:
        n_e = U_elem[0].shape[0]
        n_ip = geom["shared"]["quad_w"].shape[0]
        xi = jnp.zeros((n_e, n_ip, model.num_dofs))
        xi_prev = xi

    def at_ip(N_ip, grad_ip, U_e, U_pe, xi_ip, xi_prev_ip):
        shapes = [ShapeFunctionsAtIP(N=N_ip[r], grad_N=grad_ip[r])
                  for r in range(num_blocks)]
        U_ip = interpolate_global_fields_at_ip(U_e, shapes, var_names)
        U_pip = interpolate_global_fields_at_ip(U_pe, shapes, var_names)
        if is_mixed:
            if coupled:
                dev = model.dev_cauchy(xi_ip, xi_prev_ip, params, U_ip,
                                       U_pip)
            else:
                dev = model.dev_cauchy_closed_form(params, U_ip, U_pip)
            sigma = dev - U_ip.fields["p"][0] * jnp.eye(3, dtype=dev.dtype)
        elif coupled:
            sigma = model.cauchy_fun(xi_ip, xi_prev_ip, params, U_ip,
                                     U_pip)
        else:
            sigma = model.cauchy_closed_form_fun(params, U_ip, U_pip)
        return vector_from_sym_tensor(sigma)

    per_ip = vmap(at_ip, in_axes=(0, 0, None, None, 0, 0))
    per_elem = vmap(per_ip, in_axes=(None, 0, 0, 0, 0, 0))
    out = per_elem(list(N_blocks), list(geom["per_elem"]["grad_N_phys"]),
                   U_elem, U_prev_elem, xi, xi_prev)
    return np.asarray(out)


def evaluate_state_var_at_ips(fe_problem: FEProblem, fe_state: FEState,
                              step: int, block_name: str,
                              resid_idx: int) -> np.ndarray:
    """One state variable at every (elem, IP) — a flat-layout slice."""
    model = fe_problem.models_by_block[block_name]
    xi = np.asarray(fe_state.xi_at(step, block_name))
    slc = model.layout.slc(model.layout.var_names[resid_idx])
    return xi[..., slc]


@dataclass(frozen=True)
class DerivedOutput:
    var_type: VarType
    evaluator: Callable[[FEProblem, FEState, int, str], np.ndarray]


DERIVED_OUTPUT_REGISTRY: dict[str, DerivedOutput] = {
    "cauchy": DerivedOutput(VarType.SYM_TENSOR, evaluate_cauchy_at_ips),
}
