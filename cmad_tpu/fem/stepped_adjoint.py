"""Checkpointed per-step FE value-and-gradient (stepped adjoint).

The fused scan trajectory differentiates the whole time loop in ONE
device program (``cli/fe_common.py build_fe_J_of_params_flat``) — the
right choice on directly-attached hardware, and reference parity: the
reference's FE sensitivities are likewise fully traced
(``/root/reference/cmad/cli/common.py:149-785``, jit of the trajectory).
But remote-attached links enforce a per-execution duration ceiling
(~50-68 s measured, ``benchmarks/tunnel_repro/``) that the fused
gradient breaks at the 47.6k-tet scale where the stepped PRIMAL driver
(``fem/driver.py fe_quasistatic_drive_stepped``) already had to take
over. This module is the sensitivity-side counterpart: the SAME value
and gradient with per-step dispatch granularity.

Structure (discrete checkpointed adjoint, checkpoints at step
boundaries):

- forward sweep: one device program per time step (the fused Newton
  ``_fe_newton_solve_ad`` + the QoI step contribution), storing each
  step's converged ``(U_k, xi_k)`` — the checkpoint set is tiny
  (``n_steps x (n_dofs + n_elems*n_ips*n_xi)`` floats);
- reverse sweep: one device program per time step — ``jax.vjp`` of the
  step map THROUGH THE STORED SOLUTION (``_fe_solution_at_ad``: the
  converged ``U*_k`` is passed in as data, the Newton loop is skipped,
  and differentiation applies the same IFT rule at ``U*_k``),
  transposing the IFT linearization (adjoint solve against K^T via the
  registered linear-solve transpose), accumulating the parameter
  cotangent on host and propagating ``(dU_{k-1}, dxi_{k-1})``
  backwards.

Cost: one forward + one reverse program per step, the reverse ~one
Newton ITERATION (one local-solve pass + one assembly linearization +
one transpose solve) — every dispatch bounded well under the ceiling
that the uncapped stepped primal driver already meets. Set
``reuse_primal=False`` to re-solve Newton inside the reverse step
instead (the belt-and-suspenders mode the parity test cross-checks).

Gradient parity with the fused scan path is asserted in
``tests/fem/test_stepped_adjoint.py``.
"""
from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from cmad_tpu import config
from cmad_tpu.fem.fe_problem import FEProblem
from cmad_tpu.fem.nonlinear_solver import (
    DEFAULT_LINEAR_SOLVER_SETTINGS,
    _fe_newton_solve_ad,
    _fe_solution_at_ad,
    default_nonlinear_settings,
    freeze_settings,
)
from cmad_tpu.typing import JaxArray, Params


def build_fe_stepped_value_and_grad(
        fe_problem: FEProblem,
        params_by_block_of_flat: Callable[[JaxArray],
                                          Mapping[str, Params]],
        qoi,
        nonlinear_solver_settings: dict[str, Any] | None = None,
        linear_solver_settings: dict[str, Any] | None = None,
        reuse_primal: bool = True,
        checkpoint_offload: bool = False):
    """Host-loop ``(J, dJ/dparams_flat)`` with per-step dispatches.

    ``params_by_block_of_flat`` maps the flat active-parameter vector to
    the per-block parameter trees inside the trace (the same overlay the
    scan path uses). ``qoi`` is an FEQoI (or None for a pure drive whose
    gradient is zero — useful only for testing). ``reuse_primal=True``
    (default) differentiates through the STORED converged solution in
    the reverse sweep (no Newton recompute); False re-solves.

    **Checkpoint memory bound**: the forward sweep stores every step's
    converged ``(U_k, xi_k)``, so HBM holds
    ``n_steps x (n_dofs + n_elems * n_ips * n_xi)`` floats on top of
    the working set — at 100k tets (1 IP, 7-component xi, ~60k dofs,
    f32) that is ~3 MB/step, i.e. ~1000 steps per GB. When
    ``n_steps x state`` approaches HBM, set ``checkpoint_offload=True``
    to keep each checkpoint on HOST between the sweeps (one
    device_get after each forward step, one upload per reverse step —
    trades a 2x state transfer per step for an O(1)-in-steps device
    footprint).

    Returns ``value_and_grad(params_flat, state_init, t_schedule) ->
    (float J, np.ndarray grad)``. Each time step issues one forward and
    one reverse device program; both compile once and are reused for
    every step (t is a traced argument).
    """
    nls = {**default_nonlinear_settings(),
           **(nonlinear_solver_settings or {})}
    lss = {**DEFAULT_LINEAR_SOLVER_SETTINGS,
           **(linear_solver_settings or {})}
    nls_frozen, lss_frozen = freeze_settings(nls), freeze_settings(lss)
    dtype = config.real_dtype()

    def step_out(params_flat, U_prev, xi_prev, t, t_prev, fe_arrays):
        params_by_block = params_by_block_of_flat(params_flat)
        U, xi_solved = _fe_newton_solve_ad(
            fe_problem, fe_arrays, params_by_block, U_prev, xi_prev, t,
            nls_frozen, lss_frozen)
        xi = {**xi_prev, **xi_solved}
        if qoi is None:
            j = jnp.zeros((), dtype=dtype)
        else:
            contrib = qoi.step_contribution(params_by_block, fe_arrays)
            j = contrib(U, U_prev, xi, xi_prev, t, t_prev)
        return U, xi, j

    fwd = jax.jit(step_out)

    def step_out_at(params_flat, U_prev, xi_prev, t, t_prev, fe_arrays,
                    U_star):
        """The same step map, evaluated THROUGH the stored solution:
        Newton is skipped; the IFT rule differentiates at U_star."""
        params_by_block = params_by_block_of_flat(params_flat)
        U, xi_solved = _fe_solution_at_ad(
            fe_problem, fe_arrays, params_by_block, U_prev, xi_prev, t,
            nls_frozen, lss_frozen, U_star)
        xi = {**xi_prev, **xi_solved}
        if qoi is None:
            j = jnp.zeros((), dtype=dtype)
        else:
            contrib = qoi.step_contribution(params_by_block, fe_arrays)
            j = contrib(U, U_prev, xi, xi_prev, t, t_prev)
        return U, xi, j

    def step_pullback(params_flat, U_prev, xi_prev, t, t_prev,
                      fe_arrays, U_star, cot_U, cot_xi, cot_j):
        if reuse_primal:
            def f(p, U0, x0):
                return step_out_at(p, U0, x0, t, t_prev, fe_arrays,
                                   U_star)
        else:
            def f(p, U0, x0):
                return step_out(p, U0, x0, t, t_prev, fe_arrays)
        _, pull = jax.vjp(f, params_flat, U_prev, xi_prev)
        dp, dU0, dx0 = pull((cot_U, cot_xi, cot_j))
        return dp, dU0, dx0

    bwd = jax.jit(step_pullback)

    def value_and_grad(params_flat, state_init,
                       t_schedule: Sequence[float]):
        fe_arrays = fe_problem.kernel_arrays
        ts = [jnp.asarray(float(t), dtype=dtype) for t in t_schedule]
        params_flat = jnp.asarray(params_flat, dtype=dtype)
        U_prev, xi_prev = state_init
        U_prev = jnp.asarray(U_prev, dtype=dtype)
        xi_prev = {k: jnp.asarray(v) for k, v in xi_prev.items()}

        # forward sweep with step-boundary checkpoints (optionally
        # host-offloaded so the device footprint stays O(1) in steps)
        def _store(U, xi):
            if checkpoint_offload:
                return (np.asarray(U),
                        {b: np.asarray(v) for b, v in xi.items()})
            return (U, xi)

        def _load(ckpt):
            U, xi = ckpt
            if checkpoint_offload:
                return (jnp.asarray(U),
                        {b: jnp.asarray(v) for b, v in xi.items()})
            return (U, xi)

        states = [_store(U_prev, xi_prev)]
        J = 0.0
        for k in range(1, len(ts)):
            U_prev, xi_prev, j = fwd(params_flat, U_prev, xi_prev,
                                     ts[k], ts[k - 1], fe_arrays)
            J += float(j)  # host sync: bounds this dispatch's lifetime
            # with offload the LIST keeps host copies only; the live
            # (U_prev, xi_prev) device buffers are freed as soon as the
            # next step's outputs replace them
            states.append(_store(U_prev, xi_prev))

        # reverse sweep
        grad = jnp.zeros_like(params_flat)
        U_last, xi_last = _load(states[-1])
        cot_U = jnp.zeros_like(U_last)
        cot_xi = jax.tree.map(jnp.zeros_like, xi_last)
        one = jnp.ones((), dtype=dtype)
        for k in range(len(ts) - 1, 0, -1):
            U0, x0 = _load(states[k - 1])
            U_star_k, _ = _load(states[k])
            dp, cot_U, cot_xi = bwd(params_flat, U0, x0, ts[k],
                                    ts[k - 1], fe_arrays, U_star_k,
                                    cot_U, cot_xi, one)
            grad = grad + dp
            _ = float(grad[0]) if grad.size else 0.0  # host sync per step
        return J, np.asarray(grad, dtype=np.float64)

    return value_and_grad
