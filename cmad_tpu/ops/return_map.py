"""Batched return-map kernel: the framework's hot loop.

This is the structure-of-arrays core the reference runs per-IP inside FE
assembly (``cmad/fem/assembly.py:416-537`` COUPLED kernels +
``cmad/models/nonlinear_solver.py:88`` local Newton). Here the whole
Gauss-point batch is one HBM-resident state array ``(n_points, nxi)`` and
the Newton iteration runs masked across all points simultaneously —
``vmap`` of the IFT ``custom_jvp`` solve, jitted once.

The per-point linear solves are small dense systems (nxi = 7 for a 3D
elastic-plastic point); XLA batches the LU over the point dimension, and
every residual/Jacobian evaluation is fused elementwise VPU work.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import vmap

from cmad_tpu.models.deformation_types import DefType
from cmad_tpu.models.global_fields import GlobalFieldsAtPoint
from cmad_tpu.models.nonlinear_solver import make_newton_solve
from cmad_tpu.typing import JaxArray


def j2_voce_kind(model) -> str | None:
    """``"rate"`` / ``"total"`` when ``model`` is a J2+Voce FULL_3D
    elastic-plastic model (default constitutive funs, fixed identity
    material rotation) — the exact cases the analytic radial returns
    (ops/j2_radial_return.py, ~80x the generic kernel) reproduce to the
    Newton tolerance; ``None`` otherwise. The rotation must be
    inactive: specialization keys on build-time STRUCTURE, and a
    calibrated rotation could change at call time."""
    from cmad_tpu.models.small_elastic_plastic import SmallElasticPlastic
    from cmad_tpu.models.small_rate_elastic_plastic import (
        SmallRateElasticPlastic,
    )
    if type(model) is SmallRateElasticPlastic:
        kind = "rate"
    elif type(model) is SmallElasticPlastic:
        kind = "total"
    else:
        return None
    if not getattr(model, "_uses_default_funs", False):
        return None
    if model._def_type != DefType.FULL_3D:
        return None
    vals = model.parameters.values
    try:
        plastic = vals["plastic"]
        if set(plastic["effective stress"]) != {"J2"}:
            return None
        if set(plastic["flow stress"]["hardening"]) != {"voce"}:
            return None
        if "initial yield" not in plastic["flow stress"]:
            return None
        R = np.asarray(vals["rotation matrix"])
        return kind if np.allclose(R, np.eye(3)) else None
    except (KeyError, TypeError):
        return None


def j2_voce_specializable(model) -> bool:
    return j2_voce_kind(model) is not None


def make_j2_radial_return_for(model, prefer_pallas: bool = True):
    """The analytic radial return matching ``model``'s state layout
    (requires ``j2_voce_specializable(model)``). Rate-form on TPU gets
    the Pallas kernel unless ``prefer_pallas=False`` — the Pallas
    wrapper expects a leading batch axis, so per-point callers (the FE
    per-IP evaluator, which vmaps outside) need the XLA form."""
    kind = j2_voce_kind(model)
    if kind == "rate":
        if prefer_pallas and jax.default_backend() == "tpu":
            from cmad_tpu.ops.pallas_radial_return import (
                make_pallas_j2_radial_return,
            )
            return make_pallas_j2_radial_return(model.parameters)
        from cmad_tpu.ops.j2_radial_return import make_j2_radial_return
        return make_j2_radial_return(model.parameters)
    if kind == "total":
        # measured on one TPU chip at 4M points: XLA-fused total form
        # 325M updates/s vs 271M for the Pallas variant (the total form
        # reads only the current strain, and XLA fuses it perfectly —
        # the Pallas packing transposes cost more than they save), so
        # the XLA form is preferred on every backend
        from cmad_tpu.ops.j2_radial_return import (
            make_j2_radial_return_total,
        )
        return make_j2_radial_return_total(model.parameters)
    raise ValueError(
        f"{type(model).__name__} is not radial-return specializable")


def make_batched_return_map(model, max_iters: int = 10,
                            abs_tol: float | None = None,
                            rel_tol: float | None = None,
                            specialize: bool = False):
    """Build ``step(xi_prev, grad_u, grad_u_prev, params) -> (xi, sigma)``
    batched over the leading point axis.

    ``xi_prev``: (N, nxi); ``grad_u``/``grad_u_prev``: (N, 3, 3) current
    and previous displacement gradients; ``params``: replicated pytree.
    Returns the converged state and Cauchy stress per point.

    With ``specialize=True``, models recognized by
    :func:`j2_voce_specializable` dispatch to the analytic radial
    return — the Pallas kernel on TPU, the XLA-fused form elsewhere —
    and diagonal-Hosford models dispatch to the reduced 4-dof Newton
    (ops/hosford_return.py).
    """
    from cmad_tpu.ops.hosford_return import (
        hosford_reducible,
        make_hosford_local_solve,
    )

    if specialize and j2_voce_specializable(model):
        return make_j2_radial_return_for(model)

    from cmad_tpu.ops.hill_return import (
        hill_reducible,
        make_hill_local_solve,
    )

    from cmad_tpu.ops.principal_return import (
        make_principal_hosford_local_solve,
        principal_hosford_reducible,
    )

    if specialize and hosford_reducible(model):
        solve = make_hosford_local_solve(model, max_iters=max_iters,
                                         abs_tol=abs_tol,
                                         rel_tol=rel_tol)
    elif specialize and principal_hosford_reducible(model):
        solve = make_principal_hosford_local_solve(
            model, max_iters=max_iters, abs_tol=abs_tol, rel_tol=rel_tol)
    elif specialize and hill_reducible(model):
        solve = make_hill_local_solve(model, max_iters=max_iters,
                                      abs_tol=abs_tol, rel_tol=rel_tol)
    else:
        solve = make_newton_solve(model.residual_fun,
                                  max_iters=max_iters,
                                  abs_tol=abs_tol, rel_tol=rel_tol)

    def point_step(xi_prev, grad_u, grad_u_prev, params):
        dtype = grad_u.dtype
        U = GlobalFieldsAtPoint(
            fields={"u": jnp.zeros(3, dtype=dtype)},
            grad_fields={"u": grad_u})
        U_prev = GlobalFieldsAtPoint(
            fields={"u": jnp.zeros(3, dtype=dtype)},
            grad_fields={"u": grad_u_prev})
        xi = solve(xi_prev, xi_prev, params, U, U_prev)
        sigma = model.cauchy_fun(xi, xi_prev, params, U, U_prev)
        return xi, sigma

    batched = vmap(point_step, in_axes=(0, 0, 0, None))
    return jax.jit(batched)


def make_soa_radial_return(parameters):
    """The component-major (SoA) J2+Voce radial return for the current
    backend: the Pallas TPU kernel on TPU, the XLA-fused form elsewhere.
    Contract (``ops/j2_radial_return.py`` SoA section):
    ``step(xi_soa: (8, N), de_soa: (8, N), params) -> (8, N)``.

    This is the layout for workloads that HOLD state across dispatches
    — time-stepped point histories and calibration ensembles — where
    the AoS ``(N, 7)`` layout would put 7 components on the 128-wide
    TPU lane axis and waste ~18x the bandwidth at every jit boundary.
    """
    if jax.default_backend() == "tpu":
        from cmad_tpu.ops.pallas_radial_return import (
            make_pallas_j2_radial_return_soa,
        )
        return make_pallas_j2_radial_return_soa(parameters)
    from cmad_tpu.ops.j2_radial_return import make_j2_radial_return_soa
    return make_j2_radial_return_soa(parameters)


def make_j2_history_drive(parameters, record_alpha: bool = False,
                          fused: bool | None = None,
                          layout: str = "soa8"):
    """Batched J2+Voce history driver, component-major throughout:
    ``drive(xi0_soa: (8, N), de_hist: (T, 8, N), params)`` scans the
    strain-increment history carrying the (8, N) state — the
    million-point analogue of the reference's per-point MP primal loop
    (``cmad/cli/primal.py:129``), with the whole history one compiled
    XLA program. Returns the final state, or ``(final, alpha_hist)``
    with ``alpha_hist: (T, N)`` when ``record_alpha`` (the accumulated
    plastic strain per step — the cheap-to-record scalar QoI; recording
    full stress histories would triple the HBM traffic).

    The point batch is padded to the Pallas tile ONCE before the scan
    (and sliced once after), so the hot loop carries tile-aligned state
    instead of re-padding/re-slicing every step — two full-array copies
    per step saved for non-aligned N.

    On TPU (``record_alpha=False``) the drive runs the FUSED history
    kernel: HIST_CHUNK (=8) radial returns per Pallas invocation with
    the state resident in VMEM across the chunk, dropping HBM traffic
    from 96 to ``32 + 64/chunk`` = 40 B/update (the strain history is
    the only per-step stream). ``record_alpha`` forces the per-step
    path (alpha is materialized every step anyway).

    ``layout='wide'`` takes the full-sublane layout instead:
    ``xi0 (64, N/8), de_hist (T, 64, N/8)`` — the (8, N) arrays viewed
    as row-major (64, N/8), component c on rows [8c, 8c+8). Same
    pointwise math, bit-identical results, measured 1.21x faster on
    TPU (52% of HBM roofline) — but ONLY worth it when the history is
    GENERATED in this layout: converting (8, N) at the call boundary
    is a physical tiled-layout relayout costing ~4x the kernel
    (pallas_radial_return.py's layout note). Requires
    ``record_alpha=False`` and the fused path."""
    if layout not in ("soa8", "wide"):
        raise ValueError(f"layout must be 'soa8' or 'wide'; got {layout!r}")
    step = make_soa_radial_return(parameters)

    on_tpu = jax.default_backend() == "tpu"
    use_fused = ((on_tpu if fused is None else fused)
                 and not record_alpha)
    if layout == "wide" and not use_fused:
        raise ValueError(
            "layout='wide' requires the fused path "
            "(record_alpha=False, fused not disabled)")
    if use_fused:
        import functools

        from cmad_tpu.ops.j2_radial_return import j2_voce_scalars
        from cmad_tpu.ops.pallas_radial_return import (
            HIST_CHUNK,
            TILE_SOA as _tile,
            soa_history_chunk_pallas,
            soa_history_full_pallas,
        )

        if layout == "wide":
            from cmad_tpu.ops.pallas_radial_return import (
                _TILE_WIDE as _tile,
                soa_history_chunk_pallas_wide as soa_history_chunk_pallas,
                soa_history_full_pallas_wide as soa_history_full_pallas,
            )

        # interpreter mode off-TPU (``fused=True`` in CPU tests)
        soa_history_chunk_pallas = functools.partial(
            soa_history_chunk_pallas, interpret=not on_tpu)
        soa_history_full_pallas = functools.partial(
            soa_history_full_pallas, interpret=not on_tpu)
    elif on_tpu:
        from cmad_tpu.ops.pallas_radial_return import TILE_SOA as _tile
    else:
        _tile = 1

    def drive(xi0_soa, de_hist, params):
        n = xi0_soa.shape[1]
        pad = (-n) % _tile
        if pad:
            xi0_soa = jnp.pad(xi0_soa, ((0, 0), (0, pad)))
            de_hist = jnp.pad(de_hist, ((0, 0), (0, 0), (0, pad)))

        if use_fused:
            scalars = j2_voce_scalars(params, xi0_soa.dtype)
            T = de_hist.shape[0]
            chunks, rem = divmod(T, HIST_CHUNK)
            xi = xi0_soa
            if chunks:
                # ONE pallas_call for the whole chunk-aligned history:
                # grid (tiles, chunks) with chunks innermost keeps the
                # state in VMEM end to end; the former lax.scan over
                # chunk blocks paid a per-iteration dynamic-slice copy
                # of the (CHUNK, 8, N) block (~64 B/update of hidden
                # HBM traffic — measured 28% of the r3 headline)
                xi = soa_history_full_pallas(
                    xi, de_hist[:chunks * HIST_CHUNK], scalars)
            if rem:
                xi = soa_history_chunk_pallas(
                    xi, de_hist[chunks * HIST_CHUNK:], scalars)
            return xi[:, :n] if pad else xi

        def one(xi, de):
            xi_new = step(xi, de, params)
            return xi_new, (xi_new[6] if record_alpha else None)

        xi_fin, alphas = jax.lax.scan(one, xi0_soa, de_hist)
        if pad:
            xi_fin = xi_fin[:, :n]
            if record_alpha:
                alphas = alphas[:, :n]
        return (xi_fin, alphas) if record_alpha else xi_fin

    return jax.jit(drive)


def make_sharded_return_map(model, mesh, axis_name: str = "elem",
                            **newton_kwargs):
    """Return-map step sharded over a device mesh's element axis.

    The point batch is sharded on its leading axis; parameters are
    replicated. XLA partitions the batched solve with zero collectives
    (embarrassingly parallel), which is the whole point of putting the
    element dimension on the mesh.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    step = make_batched_return_map(model, **newton_kwargs)
    shard = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    return jax.jit(
        step,
        in_shardings=(shard, shard, shard, repl),
        out_shardings=(shard, shard),
    )
