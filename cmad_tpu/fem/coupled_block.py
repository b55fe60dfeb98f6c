"""Point-batch COUPLED fast path for displacement-form equilibrium.

The generic COUPLED assembly (reference hot loop:
``cmad/fem/assembly.py:416-537`` driving
``cmad/global_residuals/global_residual.py:341``) obtains each element
tangent by ``jacfwd`` over the element's displacement coefficients — a
``nd x 3``-wide forward sweep (12 tangents on a tet) through
interpolation, the per-IP local Newton's IFT rule, the stress map, and
the weak form, under nested (element, IP) vmaps.

For the displacement-form small-strain equilibrium residual the tangent
has classical B-matrix structure: with ``sigma`` a function of the
symmetric strain alone,

    R[a, i]          = grad_N[a, j] sigma[j, i] w dv
    K[(a,i), (b,k)]  = c_A B[A,(a,i)] D66[A, B] B[B,(b,k)] w dv

where ``B[A,(b,k)] = d eps6_A / d U[b,k]`` is the constant-per-IP
strain-displacement operator, ``D66 = d sigma6 / d eps6`` is the 6x6
algorithmic (consistent) tangent, and ``c = [1,2,2,1,2,1]`` counts the
off-diagonal pairs (internal sym-vec order [xx, xy, xz, yy, yz, zz]).

This module assembles whole element blocks that way:

1. strain (total form) or strain increment (rate form) for every
   (element, IP) in one einsum;
2. the per-point local solve + stress map vmapped over the FLAT
   ``E*Q`` point batch, with ``D66`` from a SIX-wide ``jacfwd`` in
   strain space — six IFT linear solves against the one factorized
   local Jacobian instead of twelve element-dof tangents through all
   the FE plumbing;
3. ``R`` and ``K`` as dense batched einsums (MXU-shaped), no scan over
   IPs, no per-element AD.

Exactness: both model families' residual/stress consume the global
fields only through ``sym(grad u)`` (rate form: the increment
``sym(grad u) - sym(grad u_prev)``; total form: ``sym(grad u)``), then
apply parameter-only linear maps (material-frame rotation), so driving
the point function with the symmetric (incremental) strain reproduces
the element-path values exactly; ``tests/fem/test_coupled_block_fastpath
.py`` pins R/K/xi equivalence per yield family. The J2+Voce case keeps
its dedicated SoA/Pallas path (``fem/j2_block.py``) with the
closed-form tangent; this path serves everything else the local-solve
menu specializes (Hosford diagonal, principal Hosford, Hill) and the
generic 7-dof Newton.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from cmad_tpu.models.deformation_types import DefType
from cmad_tpu.models.global_fields import GlobalFieldsAtPoint
from cmad_tpu.models.var_types import (
    sym_tensor_from_vector,
    vector_from_sym_tensor,
)

# off-diagonal sym-vec entries represent two tensor slots
_PAIR_WEIGHT = np.array([1.0, 2.0, 2.0, 1.0, 2.0, 1.0])
_PAIRS = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))


def _strain_dof_tensor(dtype) -> jnp.ndarray:
    """T[A, k, j] with ``B[e,q,A,b,k] = T[A,k,j] grad_N[e,q,b,j]``:
    d eps6_A / d U[b,k] for eps = sym(grad u), grad_u[i,j] =
    U[b,i] grad_N[b,j]."""
    T = np.zeros((6, 3, 3))
    for A, (m, n) in enumerate(_PAIRS):
        T[A, m, n] += 0.5
        T[A, n, m] += 0.5
    for A, (m, n) in enumerate(_PAIRS):
        if m == n:
            T[A, m, n] = 1.0
    return jnp.asarray(T, dtype=dtype)


def pointbatch_enabled() -> bool:
    """``CMAD_FE_POINTBATCH=0`` disables this path specifically;
    ``CMAD_FE_BLOCK_FASTPATH=0`` is the MASTER switch disabling every
    block-level fast path (this one and fem/j2_block.py) so a single
    env var falls assembly all the way back to the nested per-IP
    vmaps when debugging."""
    from cmad_tpu.fem.j2_block import fe_block_fastpath_enabled

    return (fe_block_fastpath_enabled()
            and os.environ.get("CMAD_FE_POINTBATCH", "1") != "0")


def pointbatch_applicable(gr, model, mode, print_local_convergence) -> bool:
    """True when the displacement-form COUPLED block can assemble via
    the point-batch B-matrix path: single-residual 3D equilibrium,
    either small-strain elastic-plastic family at FULL_3D (7-dof local
    state), per-IP convergence printing off. J2+Voce blocks are served
    by the dedicated SoA path (``fem/j2_block.py``) instead."""
    from cmad_tpu.global_residuals.modes import GlobalResidualMode
    from cmad_tpu.models.small_elastic_plastic import SmallElasticPlastic
    from cmad_tpu.models.small_rate_elastic_plastic import (
        SmallRateElasticPlastic,
    )

    return (pointbatch_enabled()
            and mode == GlobalResidualMode.COUPLED
            and not print_local_convergence
            and gr.num_residuals == 1
            and getattr(gr, "ndims", None) == 3
            and type(model) in (SmallRateElasticPlastic,
                                SmallElasticPlastic)
            and model._def_type == DefType.FULL_3D
            and model.num_dofs == 7)


def make_pointbatch_block_kernels(
        model, local_newton_settings: dict[str, Any] | None = None) -> dict:
    """The ``{"block_R_and_K_and_xi", "block_R"}`` evaluators consumed by
    ``fem/assembly.py`` for blocks passing :func:`pointbatch_applicable`.

    Same signature contract as ``fem/j2_block.py``: both take
    ``(params, U_elem, U_prev_elem, geom, forcing_fn, t, xi_prev)`` with
    ``U_elem`` (E, nd, 3) displacement coefficients and ``xi_prev``
    (E, Q, 7) per-IP state; the local solve is whatever
    ``GlobalResidual._build_local_solve`` picks for the model (reduced
    Hosford / principal / Hill, or the generic IFT Newton), so the
    converged states match the element path to Newton tolerance.
    """
    from cmad_tpu.global_residuals.global_residual import GlobalResidual
    from cmad_tpu.models.small_rate_elastic_plastic import (
        SmallRateElasticPlastic,
    )

    if local_newton_settings is None:
        from cmad_tpu import config
        abs_tol, rel_tol = config.newton_tols("fe_local")
        local_newton_settings = {"abs_tol": abs_tol, "rel_tol": rel_tol,
                                 "max_iters": 20}
    local_solve = GlobalResidual._build_local_solve(
        model, local_newton_settings, print_local_convergence=False)
    kind = ("rate" if type(model) is SmallRateElasticPlastic else "total")

    def point_fn(g6, xi_prev, params):
        # g6: the symmetric strain INCREMENT (rate form) or TOTAL strain
        # (total form). Both families consume (U, U_prev) only through
        # sym-strain differences, so (g, 0) is an exact stand-in.
        g = sym_tensor_from_vector(g6)
        zero3 = jnp.zeros(3, dtype=g6.dtype)
        U_ip = GlobalFieldsAtPoint(fields={"u": zero3},
                                   grad_fields={"u": g})
        U0 = GlobalFieldsAtPoint(
            fields={"u": zero3},
            grad_fields={"u": jnp.zeros((3, 3), dtype=g6.dtype)})
        xi = local_solve(xi_prev, xi_prev, params, U_ip, U0)
        sigma = model.cauchy_fun(xi, xi_prev, params, U_ip, U0)
        s6 = vector_from_sym_tensor(sigma)
        return s6, (s6, xi)

    point_tangent = jax.jacfwd(point_fn, argnums=0, has_aux=True)
    batched_tangent = jax.vmap(point_tangent, in_axes=(0, 0, None))
    batched_point = jax.vmap(point_fn, in_axes=(0, 0, None))

    def _common(U_e, Up_e, geom, xi_prev):
        gradN = geom["per_elem"]["grad_N_phys"][0]     # (E, Q, nd, 3)
        wdv = (geom["shared"]["quad_w"][None, :]
               * geom["per_elem"]["iso_jac_det"])      # (E, Q)
        E, Q = wdv.shape
        dU = (U_e - Up_e) if kind == "rate" else U_e
        G = jnp.einsum("eai,eqaj->eqij", dU, gradN)    # grad u (E,Q,3,3)
        g6 = vector_from_sym_tensor(
            0.5 * (G + jnp.swapaxes(G, -1, -2)))       # (E, Q, 6)
        return gradN, wdv, E, Q, g6.reshape(E * Q, 6), \
            xi_prev.reshape(E * Q, 7)

    def _residual(s6, gradN, wdv, forcing_fn, geom, t):
        E, Q = wdv.shape
        sigma = sym_tensor_from_vector(s6.reshape(E, Q, 6))
        R = jnp.einsum("eqaj,eqji,eq->eai", gradN, sigma, wdv)
        if forcing_fn is not None:
            coords = geom["per_elem"]["coords_ip"]      # (E, Q, 3)
            fvals = jax.vmap(jax.vmap(
                lambda c: jnp.asarray(forcing_fn(c, t))))(coords)
            N0 = geom["shared"]["N"][0]                 # (Q, nd)
            R = R - jnp.einsum("qa,eqi,eq->eai", N0, fvals, wdv)
        return R

    def block_r_and_k_and_xi(params, U_e, Up_e, geom, forcing_fn, t,
                             xi_prev):
        gradN, wdv, E, Q, g6, xi_p = _common(U_e, Up_e, geom, xi_prev)
        D66, (s6, xi) = batched_tangent(g6, xi_p, params)
        R = _residual(s6, gradN, wdv, forcing_fn, geom, t)

        T = _strain_dof_tensor(wdv.dtype)
        B = jnp.einsum("Akj,eqbj->eqAbk", T, gradN)     # (E,Q,6,nd,3)
        c = jnp.asarray(_PAIR_WEIGHT, dtype=wdv.dtype)
        Dw = (c[:, None] * D66.reshape(E, Q, 6, 6)
              * wdv[..., None, None])
        K = jnp.einsum("eqAai,eqAB,eqBbk->eaibk", B, Dw, B)
        return R, K, xi.reshape(E, Q, 7)

    def block_r(params, U_e, Up_e, geom, forcing_fn, t, xi_prev):
        gradN, wdv, _E, _Q, g6, xi_p = _common(U_e, Up_e, geom, xi_prev)
        _s6, (s6, _xi) = batched_point(g6, xi_p, params)
        return _residual(s6, gradN, wdv, forcing_fn, geom, t)

    # not jitted here for the same reason as fem/j2_block.py: consumers
    # trace these into an enclosing jit, and forcing_fn is a callable
    return {"block_R_and_K_and_xi": block_r_and_k_and_xi,
            "block_R": block_r}
