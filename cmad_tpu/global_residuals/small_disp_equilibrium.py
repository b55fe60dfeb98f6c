"""3D quasi-static small-deformation equilibrium weak form.

Parity: reference ``cmad/global_residuals/small_disp_equilibrium.py``.
Displacement form (one block, ``u``):
``R[a, i] = grad_N_phys[a, j] sigma[j, i] w dv``; mixed u-p form adds a
stabilized equal-order pressure block (``sigma = dev - p I``; pressure
equation ties ``p`` to ``-hydro`` with tau grad(p).grad(q) stabilization,
``tau = mult * 0.5 h^2 / mu``). The near-null space is the rigid-body
basis (plus a constant-pressure mode for mixed), computed directly from
node coordinates — no pyamg dependency.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from cmad_tpu.global_residuals.global_residual import GlobalResidual
from cmad_tpu.global_residuals.modes import GlobalResidualMode
from cmad_tpu.io.registry import register_global_residual
from cmad_tpu.models.deformation_types import DefType, def_type_ndims
from cmad_tpu.models.var_types import VarType


def rigid_body_modes(coords: np.ndarray) -> np.ndarray:
    """Six 3D rigid-body modes (3 translations + 3 rotations e_k x r) in
    interleaved-by-node DOF order; shape (3 n_nodes, 6)."""
    n = coords.shape[0]
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    modes = np.zeros((n, 3, 6))
    for k in range(3):
        modes[:, k, k] = 1.0
    # rotation about x: (0, -z, y); about y: (z, 0, -x); about z: (-y, x, 0)
    modes[:, 1, 3], modes[:, 2, 3] = -z, y
    modes[:, 0, 4], modes[:, 2, 4] = z, -x
    modes[:, 0, 5], modes[:, 1, 5] = -y, x
    return modes.reshape(3 * n, 6)


@register_global_residual("small_disp_equilibrium")
class SmallDispEquilibrium(GlobalResidual):

    def __init__(self, ndims: int = 3, mixed: bool = False,
                 stabilization_multiplier: float = 1.0) -> None:
        self._ndims = ndims
        self._mixed = mixed
        self._stab = stabilization_multiplier
        if mixed and ndims != 3:
            raise NotImplementedError(
                "mixed formulation currently supports ndims=3 only")

        self._init_residuals(2 if mixed else 1)
        self._var_types[0] = VarType.VECTOR
        self._num_eqs[0] = ndims
        self.resid_names[0] = "equilibrium"
        self.var_names[0] = "u"
        if mixed:
            self._var_types[1] = VarType.SCALAR
            self._num_eqs[1] = 1
            self.resid_names[1] = "pressure"
            self.var_names[1] = "p"

        def residual_fn(xi, xi_prev, params, U, U_prev, model, mode,
                        shapes_ip, w, dv, h, ip_set):
            U_ip = self.interpolate_global_fields_at_ip(U, shapes_ip)
            Up_ip = self.interpolate_global_fields_at_ip(U_prev, shapes_ip)

            if not self._mixed:
                if mode == GlobalResidualMode.CLOSED_FORM:
                    sigma = model.cauchy_closed_form_fun(params, U_ip, Up_ip)
                else:
                    sigma = model.cauchy_fun(xi, xi_prev, params, U_ip,
                                             Up_ip)
                return [(shapes_ip[0].grad_N @ sigma) * w * dv]

            if mode == GlobalResidualMode.CLOSED_FORM:
                dev = model.dev_cauchy_closed_form(params, U_ip, Up_ip)
                hydro = model.hydro_cauchy_closed_form(params, U_ip, Up_ip)
            else:
                dev = model.dev_cauchy(xi, xi_prev, params, U_ip, Up_ip)
                hydro = model.hydro_cauchy(xi, xi_prev, params, U_ip, Up_ip)

            p = U_ip.fields["p"][0]
            sigma = dev - p * jnp.eye(self._ndims, dtype=dev.dtype)
            R_u = (shapes_ip[0].grad_N @ sigma) * w * dv

            psf = model.pressure_scale_factor(params)
            mu = model.shear_scale_factor(params)
            tau = self._stab * 0.5 * h**2 / mu
            grad_p = U_ip.grad_fields["p"][0]
            R_p = (-(p + hydro) / psf * shapes_ip[1].N
                   - tau * (shapes_ip[1].grad_N @ grad_p)) * w * dv
            return [R_u, R_p[:, None]]

        super().__init__(residual_fn)

    @property
    def mixed(self) -> bool:
        return self._mixed

    def for_model(self, model, mode=GlobalResidualMode.COUPLED,
                  local_newton_settings=None,
                  print_local_convergence=False):
        if self._mixed and not model.supports_mixed:
            raise ValueError(
                f"mixed formulation requires supports_mixed; "
                f"{type(model).__name__} lacks it")
        evaluators = super().for_model(model, mode, local_newton_settings,
                                       print_local_convergence)
        # block-level SoA fast path (fem/j2_block.py): whole-block
        # assembly kernels that assembly dispatches to instead of the
        # nested per-IP vmaps, when the model/form admit them
        from cmad_tpu.fem.j2_block import (
            j2_block_applicable,
            make_j2_block_kernels,
        )
        if j2_block_applicable(self, model, mode, print_local_convergence):
            evaluators = {**evaluators, **make_j2_block_kernels(model)}
        else:
            # point-batch B-matrix fast path (fem/coupled_block.py) for
            # the COUPLED displacement-form blocks the J2 path skips
            # (Hosford/principal/Hill reductions, generic 7-dof Newton)
            from cmad_tpu.fem.coupled_block import (
                make_pointbatch_block_kernels,
                pointbatch_applicable,
            )
            if pointbatch_applicable(self, model, mode,
                                     print_local_convergence):
                evaluators = {
                    **evaluators,
                    **make_pointbatch_block_kernels(
                        model, local_newton_settings)}
        return evaluators

    def near_null_space(self, mesh) -> np.ndarray:
        u_modes = rigid_body_modes(np.asarray(mesh.nodes, dtype=np.float64))
        if not self._mixed:
            return u_modes
        n_u = u_modes.shape[0]
        n_p = mesh.nodes.shape[0]
        modes = np.zeros((n_u + n_p, 7))
        modes[:n_u, :6] = u_modes
        modes[n_u:, 6] = 1.0
        return modes

    def evaluate_nodal_field(self, name, fe_problem, fe_state, step):
        if name == "u":
            U = np.asarray(fe_state.U_at(step))
            u_end = (fe_problem.dof_map.block_offsets[1]
                     if self._mixed else U.shape[0])
            return U[:u_end].reshape(-1, int(self._num_eqs[0]))
        if name == "p" and self._mixed:
            U = np.asarray(fe_state.U_at(step))
            return U[fe_problem.dof_map.block_offsets[1]:].reshape(-1, 1)
        return super().evaluate_nodal_field(name, fe_problem, fe_state,
                                            step)

    @classmethod
    def from_deck(cls, gr_section: dict[str, Any],
                  ndims: int) -> "SmallDispEquilibrium":
        name = gr_section.get("def_type")
        if name is None:
            raise ValueError(
                "residuals.global residual: small_disp_equilibrium "
                "requires 'def_type'")
        expected = def_type_ndims(DefType[name.upper()])
        if expected != ndims:
            raise ValueError(
                f"def_type {name!r} implies ndims={expected} but the mesh "
                f"has ndims={ndims}")
        return cls(ndims=ndims, mixed=bool(gr_section.get("mixed", False)),
                   stabilization_multiplier=gr_section.get(
                       "stabilization multiplier", 1.0))
