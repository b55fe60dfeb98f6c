"""FE-side deck builders.

Parity: reference ``cmad/cli/common.py:149-785`` (FE half):
deck -> mesh -> GR -> per-block models -> BCs/forcing callables ->
GlobalDofMap -> FEProblem + time schedule, and the differentiable
``J(params_flat)`` closure for objective/gradient/hessian/calibrate.
"""
from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, replace
from pathlib import Path
from typing import Any

import jax.numpy as jnp
import numpy as np

from cmad_tpu import config
from cmad_tpu.cli.common import _with_material_defaults
from cmad_tpu.fem.bcs import DirichletBC, NeumannBC
from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
from cmad_tpu.fem.driver import build_fe_quasistatic_trajectory
from cmad_tpu.fem.elements import P1_TET, Q1_HEX, FiniteElement
from cmad_tpu.fem.fe_problem import FEProblem, FEState, build_fe_problem
from cmad_tpu.fem.mesh import coordinate_side_sets
from cmad_tpu.fem.quadrature import (
    hex_quadrature,
    quad_quadrature,
    tet_quadrature,
    tri_quadrature,
)
from cmad_tpu.fem.topology import ElementFamily
from cmad_tpu.global_residuals.global_residual import GlobalResidual
from cmad_tpu.global_residuals.modes import GlobalResidualMode
from cmad_tpu.io.deck import apply_deck_defaults, load_deck
from cmad_tpu.io.expressions import parse_scalar_expression
from cmad_tpu.io.mesh_io import read_mesh_file
from cmad_tpu.io.params_builder import build_parameters
from cmad_tpu.io.registry import (
    resolve_global_residual,
    resolve_model,
    resolve_qoi,
)
from cmad_tpu.io.schema import validate_deck
from cmad_tpu.models.deformation_types import DefType
from cmad_tpu.models.model import Model
from cmad_tpu.qois.fe_qoi import FEQoI

_DEFAULT_FE = {ElementFamily.HEX_LINEAR: Q1_HEX,
               ElementFamily.TET_LINEAR: P1_TET}
_FE_BY_NAME = {"Q1": Q1_HEX, "Q1_HEX": Q1_HEX,
               "P1": P1_TET, "P1_TET": P1_TET}
_COORD_NAMES = ("x", "y", "z", "t")


@dataclass(frozen=True)
class FEProblemBundle:
    resolved: dict[str, Any]
    fe_problem: FEProblem
    t_schedule: np.ndarray
    qoi: FEQoI | None = None


def build_fe_problem_from_deck(deck_path: Path,
                               subcommand: str) -> FEProblemBundle:
    deck = load_deck(deck_path)
    resolved = apply_deck_defaults(deck)
    validate_deck(resolved, subcommand)

    mesh = read_mesh_file(Path(resolved["discretization"]["mesh file"]))
    if resolved["discretization"].get("build coordinate sidesets", False):
        built = coordinate_side_sets(mesh)
        clash = sorted(set(built) & set(mesh.side_sets))
        if clash:
            raise ValueError(
                f"build coordinate sidesets would redefine existing side "
                f"set(s): {clash}")
        mesh = replace(mesh, side_sets={**mesh.side_sets, **built})
    ndims = int(mesh.nodes.shape[1])

    gr_section = resolved["residuals"]["global residual"]
    gr = resolve_global_residual(gr_section["type"]).from_deck(
        gr_section, ndims=ndims)

    is_mixed = bool(gr_section.get("mixed", False))
    if is_mixed:
        ls = resolved["linear solver"]
        precon = ls.get("preconditioner", {}).get("type")
        if ls["type"] != "direct" and not (
                ls["type"] == "gmres" and precon in ("block",
                                                     "two_level")):
            raise ValueError(
                "mixed formulations need linear solver type 'direct' or "
                "'gmres' with a 'block' or 'two_level' preconditioner "
                f"(the tangent is indefinite); got {ls['type']!r}")

    def_type = DefType[gr_section["def_type"].upper()]
    local_section = resolved["residuals"]["local residual"]
    models_by_block = _build_models(local_section, mesh, def_type)
    modes_by_block = {
        b: (GlobalResidualMode.CLOSED_FORM
            if m.supports_closed_form_cauchy
            else GlobalResidualMode.COUPLED)
        for b, m in models_by_block.items()}

    layouts = _build_field_layouts(resolved["discretization"], gr,
                                   mesh.element_family)
    components = {str(gr.var_names[r]): int(gr._num_eqs[r])
                  for r in range(gr.num_residuals)}
    dirichlet = _build_dirichlet_bcs(resolved.get("dirichlet bcs"), gr)
    dof_map = build_dof_map(mesh, layouts, dirichlet, components)
    neumann = _build_neumann_bcs(resolved.get("surface flux bcs"), gr)
    forcing = _build_forcing_fns(resolved.get("body forces"), gr)

    assembly_quad, side_quad = _quadrature_overrides(
        resolved["discretization"], mesh.element_family)
    if is_mixed and assembly_quad is None:
        assembly_quad = {mesh.element_family: _quad_rule(
            mesh.element_family, "volume", 2)}

    fe_problem = build_fe_problem(
        mesh=mesh, dof_map=dof_map, gr=gr,
        models_by_block=models_by_block, modes_by_block=modes_by_block,
        forcing_fns_by_block_idx=forcing or None,
        assembly_quadrature=assembly_quad, neumann_bcs=neumann,
        side_quadrature=side_quad,
        print_local_convergence=bool(
            local_section.get("print convergence", False)),
        local_newton_settings={
            "max_iters": int(local_section["nonlinear max iters"]),
            # deck tolerances are f64-calibrated; clamp to dtype floor
            **dict(zip(
                ("abs_tol", "rel_tol"),
                config.clamp_newton_tols(
                    float(local_section["nonlinear absolute tol"]),
                    float(local_section["nonlinear relative tol"]),
                    "fe_local"))),
            "line_search_settings": local_section.get("line search", {}),
        })

    t_schedule = _load_t_schedule(resolved["discretization"])

    qoi: FEQoI | None = None
    if "qoi" in resolved:
        qoi_cls = resolve_qoi(resolved["qoi"]["name"])
        if qoi_cls.problem_type != "fe":
            raise ValueError(
                f"qoi {resolved['qoi']['name']!r} is registered for "
                f"problem_type={qoi_cls.problem_type!r}, not 'fe'")
        qoi = qoi_cls.from_deck(resolved["qoi"], fe_problem,
                                t_schedule.tolist())

    return FEProblemBundle(resolved=resolved, fe_problem=fe_problem,
                           t_schedule=t_schedule, qoi=qoi)


def build_fe_cases(bundle: FEProblemBundle):
    """``[(name, weight, t_schedule, qoi)]`` — one entry per ``load
    cases`` deck entry, or the single base case when the section is
    absent.

    A load case re-drives the SAME FEProblem (mesh, materials, BCs as
    functions of t) through its own schedule against its own QoI data,
    each case starting from the virgin state — independent experiments
    whose objectives sum. The FE analogue of the MP multi-experiment
    calibration (reference ``cmad/calibrations/al7079/
    multi_experiment_hill_calibration.py:20-33``); designed to break
    one-ramp identifiability collapse (S and D fall onto the S*D curve
    under a single monotone ramp — benchmarks/notch_hosford/README.md,
    round-4 study — while two load depths separate them:
    ``tests/cli/test_load_cases.py``).
    """
    resolved = bundle.resolved
    cases = resolved.get("load cases")
    if not cases:
        return [("base", 1.0, bundle.t_schedule, bundle.qoi)]
    base_disc = resolved["discretization"]
    out = []
    seen: set[str] = set()
    for case in cases:
        name = case["name"]
        if name in seen:
            raise ValueError(
                f"load cases: duplicate case name {name!r}")
        seen.add(name)
        disc = dict(base_disc)
        for key in ("num steps", "step size"):
            if key in case:
                disc[key] = case[key]
        ts = _load_t_schedule(disc)
        qoi_section = {**resolved["qoi"], **(case.get("qoi") or {})}
        qoi_cls = resolve_qoi(qoi_section["name"])
        qoi = qoi_cls.from_deck(qoi_section, bundle.fe_problem,
                                ts.tolist())
        out.append((name, float(case.get("weight", 1.0)), ts, qoi))
    return out


def build_fe_J_of_params_flat(bundle: FEProblemBundle,
                              print_global_convergence: bool = False):
    """(params_flat_init, state_init, J_of_params_flat) for FE
    objective/gradient/hessian/calibrate.

    ``params_flat`` concatenates each block's canonical flat-active
    vector; the closure overlays the traced actives onto the stored
    values per block so Hessians are (n_active, n_active).
    """
    fe_problem = bundle.fe_problem
    if bundle.qoi is None:
        raise ValueError("bundle.qoi is required (non-primal subcommand)")
    gr_section = bundle.resolved["residuals"]["global residual"]
    dtype = config.real_dtype()

    state = FEState.from_problem(fe_problem,
                                 t_init=float(bundle.t_schedule[0]))
    state_init = (jnp.asarray(state.U_at(0), dtype=dtype),
                  {b: jnp.asarray(state.xi_at(0, b))
                   for b in fe_problem.models_by_block})
    cases = build_fe_cases(bundle)

    dbc_arrays = fe_problem.kernel_arrays.dbc_arrays
    for _name, _w, ts_case, _qoi in cases:
        for t in ts_case[1:]:
            fe_problem.dof_map.evaluate_prescribed_values(dbc_arrays,
                                                          float(t))

    params_flat_init, params_by_block_of_flat = fe_params_overlay(
        fe_problem)

    trajectory = build_fe_quasistatic_trajectory(
        fe_problem,
        nonlinear_solver_settings={
            "max iters": int(gr_section["nonlinear max iters"]),
            **dict(zip(
                ("abs tol", "rel tol"),
                config.clamp_newton_tols(
                    float(gr_section["nonlinear absolute tol"]),
                    float(gr_section["nonlinear relative tol"]),
                    "fe_global"))),
            "print convergence": print_global_convergence,
            "line search": gr_section.get("line search", {}),
        },
        linear_solver_settings=bundle.resolved["linear solver"])

    case_args = [(float(w), jnp.asarray(ts_case, dtype=dtype), qoi_c)
                 for _name, w, ts_case, qoi_c in cases]

    def J_of_params_flat(params_flat, state_init, fe_arrays):
        params_by_block = params_by_block_of_flat(params_flat)
        J = jnp.zeros((), dtype=dtype)
        # every case re-drives the same problem from the virgin state
        # over its own schedule; one scan instance per case in the trace
        for w, t_case, qoi_c in case_args:
            step = qoi_c.step_contribution(params_by_block, fe_arrays)
            _, _, J_c = trajectory(fe_arrays, params_by_block,
                                   state_init, t_case,
                                   qoi_step_contribution=step)
            J = J + w * J_c
        return J

    return params_flat_init, state_init, J_of_params_flat


def fe_params_overlay(fe_problem: FEProblem):
    """(params_flat_init, params_by_block_of_flat): the canonical flat
    active-parameter vector over all blocks and the traced overlay that
    reconstructs the per-block parameter trees from it."""
    dtype = config.real_dtype()
    block_names = list(fe_problem.models_by_block)
    inits, lengths = [], []
    for b in block_names:
        po = fe_problem.models_by_block[b].parameters
        flat = po.flat_active_values(return_canonical=True)
        inits.append(jnp.asarray(flat, dtype=dtype))
        lengths.append(flat.shape[0])
    params_flat_init = (jnp.concatenate(inits) if inits
                        else jnp.zeros(0, dtype=dtype))
    bounds = np.cumsum([0, *lengths])

    def params_by_block_of_flat(params_flat):
        params_by_block = {}
        for i, b in enumerate(block_names):
            po = fe_problem.models_by_block[b].parameters
            params_by_block[b] = po.tree_with_flat_active(
                params_flat[bounds[i]:bounds[i + 1]], canonical=True)
        return params_by_block

    return params_flat_init, params_by_block_of_flat


def build_fe_stepped_vg(bundle: FEProblemBundle):
    """(params_flat_init, state_init, t_schedule, vg) for the STEPPED
    sensitivity path (``fem/stepped_adjoint.py``): per-step forward and
    reverse dispatches instead of one fused traced trajectory — for
    duration-limited device links at scales where the fused gradient
    program outruns the per-execution ceiling. Selected by
    ``residuals.global residual.driver: stepped`` on the gradient /
    calibrate subcommands."""
    from cmad_tpu.fem.stepped_adjoint import build_fe_stepped_value_and_grad

    fe_problem = bundle.fe_problem
    if bundle.qoi is None:
        raise ValueError("bundle.qoi is required (non-primal subcommand)")
    gr_section = bundle.resolved["residuals"]["global residual"]
    if "max iters per dispatch" in gr_section:
        raise ValueError(
            "residuals.global residual: 'max iters per dispatch' "
            "applies to the stepped PRIMAL drive only; the stepped "
            "sensitivity path dispatches one fused Newton (+ its "
            "adjoint) per time step and cannot be capped below that. "
            "Remove it for gradient/calibrate decks ('steps per "
            "dispatch' — batching UP — is supported).")
    steps_per_dispatch = gr_section.get("steps per dispatch")
    if steps_per_dispatch is not None:
        steps_per_dispatch = int(steps_per_dispatch)
        if steps_per_dispatch < 1:
            raise ValueError(
                "residuals.global residual: 'steps per dispatch' must "
                f"be >= 1; got {steps_per_dispatch}")
    dtype = config.real_dtype()

    state = FEState.from_problem(fe_problem,
                                 t_init=float(bundle.t_schedule[0]))
    state_init = (jnp.asarray(state.U_at(0), dtype=dtype),
                  {b: jnp.asarray(state.xi_at(0, b))
                   for b in fe_problem.models_by_block})

    cases = build_fe_cases(bundle)
    dbc_arrays = fe_problem.kernel_arrays.dbc_arrays
    for _name, _w, ts_case, _qoi in cases:
        for t in ts_case[1:]:
            fe_problem.dof_map.evaluate_prescribed_values(dbc_arrays,
                                                          float(t))

    params_flat_init, params_by_block_of_flat = fe_params_overlay(
        fe_problem)
    nls_settings = {
        "max iters": int(gr_section["nonlinear max iters"]),
        **dict(zip(
            ("abs tol", "rel tol"),
            config.clamp_newton_tols(
                float(gr_section["nonlinear absolute tol"]),
                float(gr_section["nonlinear relative tol"]),
                "fe_global"))),
        "line search": gr_section.get("line search", {}),
    }
    case_vgs = [
        (float(w), ts_case, build_fe_stepped_value_and_grad(
            fe_problem, params_by_block_of_flat, qoi_c,
            nonlinear_solver_settings=nls_settings,
            linear_solver_settings=bundle.resolved["linear solver"],
            steps_per_dispatch=steps_per_dispatch))
        for _name, w, ts_case, qoi_c in cases]

    if len(case_vgs) == 1:
        _w, _ts, vg = case_vgs[0]
        return params_flat_init, state_init, bundle.t_schedule, vg

    def vg_multi(params_flat, state_init, _t_schedule):
        """Summed multi-load-case value_and_grad: each case re-drives
        the virgin state over ITS OWN schedule (the passed t_schedule
        is the base deck's and is ignored)."""
        J = 0.0
        grad = None
        for w, ts_case, vg_c in case_vgs:
            J_c, g_c = vg_c(params_flat, state_init, ts_case)
            J += w * J_c
            grad = w * g_c if grad is None else grad + w * g_c
        return J, grad

    return params_flat_init, state_init, bundle.t_schedule, vg_multi


def build_fe_stepped_hessian_fn(bundle: FEProblemBundle):
    """(params_flat_init, state_init, t_schedule, hessian_fn) for the
    STEPPED Hessian path (``fem/stepped_adjoint.py
    build_fe_stepped_hessian``): n_active forward-over-reverse HVP
    sweeps with per-step dispatches — the ``driver: stepped`` backend
    of the hessian subcommand for duration-limited device links."""
    from cmad_tpu.fem.stepped_adjoint import build_fe_stepped_hessian

    fe_problem = bundle.fe_problem
    if bundle.qoi is None:
        raise ValueError("bundle.qoi is required (non-primal subcommand)")
    gr_section = bundle.resolved["residuals"]["global residual"]
    for cap in ("max iters per dispatch", "steps per dispatch"):
        if cap in gr_section:
            raise ValueError(
                f"residuals.global residual: '{cap}' is not supported "
                "on the stepped HESSIAN path; each dispatch is one "
                "step's tangent forward or tangent reverse sweep. "
                f"Remove '{cap}' for hessian decks.")
    dtype = config.real_dtype()

    state = FEState.from_problem(fe_problem,
                                 t_init=float(bundle.t_schedule[0]))
    state_init = (jnp.asarray(state.U_at(0), dtype=dtype),
                  {b: jnp.asarray(state.xi_at(0, b))
                   for b in fe_problem.models_by_block})

    dbc_arrays = fe_problem.kernel_arrays.dbc_arrays
    for t in bundle.t_schedule[1:]:
        fe_problem.dof_map.evaluate_prescribed_values(dbc_arrays, float(t))

    params_flat_init, params_by_block_of_flat = fe_params_overlay(
        fe_problem)
    hess = build_fe_stepped_hessian(
        fe_problem, params_by_block_of_flat, bundle.qoi,
        nonlinear_solver_settings={
            "max iters": int(gr_section["nonlinear max iters"]),
            **dict(zip(
                ("abs tol", "rel tol"),
                config.clamp_newton_tols(
                    float(gr_section["nonlinear absolute tol"]),
                    float(gr_section["nonlinear relative tol"]),
                    "fe_global"))),
            "line search": gr_section.get("line search", {}),
        },
        linear_solver_settings=bundle.resolved["linear solver"])
    return params_flat_init, state_init, bundle.t_schedule, hess


# ----------------------------------------------------------------------
# deck-section helpers
# ----------------------------------------------------------------------
def _build_models(local_section, mesh, def_type) -> dict[str, Model]:
    materials = local_section["materials"]
    if set(materials) != set(mesh.element_blocks):
        raise ValueError(
            f"materials keys {sorted(materials)} must match mesh blocks "
            f"{sorted(mesh.element_blocks)}")
    model_cls = resolve_model(local_section["type"])
    return {
        b: model_cls.from_deck(
            local_section,
            build_parameters(_with_material_defaults(materials[b],
                                                     model_cls)),
            def_type)
        for b in materials}


def _build_field_layouts(disc, gr: GlobalResidual,
                         family: ElementFamily):
    overrides = disc.get("finite elements") or {}
    var_names = {str(gr.var_names[r]) for r in range(gr.num_residuals)}
    unknown = set(overrides) - var_names
    if unknown:
        raise ValueError(
            f"discretization.finite elements: unknown var_name(s) "
            f"{sorted(unknown)}; GR var_names: {sorted(var_names)}")
    layouts = []
    for r in range(gr.num_residuals):
        var = str(gr.var_names[r])
        fe = (_resolve_fe(overrides[var], family, var)
              if var in overrides else _DEFAULT_FE[family])
        layouts.append(GlobalFieldLayout(name=var, finite_element=fe))
    return layouts


def _resolve_fe(name: str, family: ElementFamily,
                var: str) -> FiniteElement:
    fe = _FE_BY_NAME.get(name)
    if fe is None:
        raise ValueError(
            f"finite elements[{var!r}]: unknown FE {name!r}; known: "
            f"{sorted(_FE_BY_NAME)}")
    if fe.element_family != family:
        raise ValueError(
            f"finite elements[{var!r}]: {name!r} is "
            f"{fe.element_family.name} but the mesh is {family.name}")
    return fe


def _quad_rule(family, kind, degree):
    table = {("volume", ElementFamily.HEX_LINEAR): hex_quadrature,
             ("volume", ElementFamily.TET_LINEAR): tet_quadrature,
             ("surface", ElementFamily.HEX_LINEAR): quad_quadrature,
             ("surface", ElementFamily.TET_LINEAR): tri_quadrature}
    return table[(kind, family)](degree)


def _quadrature_overrides(disc, family):
    quad = disc.get("quadrature") or {}
    vol, surf = quad.get("volume degree"), quad.get("surface degree")
    return ({family: _quad_rule(family, "volume", int(vol))}
            if vol is not None else None,
            {family: _quad_rule(family, "surface", int(surf))}
            if surf is not None else None)


def _resid_idx(resid_name: str, gr: GlobalResidual, where: str) -> int:
    try:
        return gr.resid_names.index(resid_name)
    except ValueError as e:
        raise ValueError(
            f"{where}: residual {resid_name!r} is not declared by the GR "
            f"(known: {gr.resid_names})") from e


def _build_dirichlet_bcs(section, gr: GlobalResidual):
    if not section:
        return []
    bcs = []
    for entry_name, entry in section.get("expression", {}).items():
        resid_name, eq, sideset, expr = entry
        where = f"dirichlet bcs.expression.{entry_name}"
        r = _resid_idx(resid_name, gr, where)
        if not 0 <= int(eq) < int(gr._num_eqs[r]):
            raise ValueError(
                f"{where}: eq {eq} out of range for {resid_name!r}")
        scalar = parse_scalar_expression(expr, _COORD_NAMES)

        def dbc_values(coords, t, scalar=scalar):
            n = coords.shape[0]
            val = jnp.asarray(scalar(x=coords[:, 0], y=coords[:, 1],
                                     z=coords[:, 2], t=t))
            return jnp.broadcast_to(val, (n,)).reshape(n, 1)

        bcs.append(DirichletBC([str(sideset)], str(gr.var_names[r]),
                               [int(eq)], dbc_values))
    return bcs


def _build_neumann_bcs(section, gr: GlobalResidual):
    if not section:
        return []
    bcs = []
    for entry_name, entry in section.get("expression", {}).items():
        where = f"surface flux bcs.expression.{entry_name}"
        resid_name, sideset, *exprs = entry
        r = _resid_idx(resid_name, gr, where)
        ncomp = int(gr._num_eqs[r])
        if len(exprs) != ncomp:
            raise ValueError(
                f"{where}: {resid_name!r} takes {ncomp} components; got "
                f"{len(exprs)}")
        fns = [parse_scalar_expression(e, _COORD_NAMES) for e in exprs]

        def nbc_values(coords, t, fns=fns):
            n = coords.shape[0]
            return jnp.stack(
                [jnp.broadcast_to(jnp.asarray(f(
                    x=coords[:, 0], y=coords[:, 1], z=coords[:, 2],
                    t=t)), (n,)) for f in fns], axis=-1)

        bcs.append(NeumannBC([str(sideset)], str(gr.var_names[r]),
                             nbc_values))
    return bcs


def _build_forcing_fns(section, gr: GlobalResidual) -> dict[int, Callable]:
    if not section:
        return {}
    out: dict[int, Callable] = {}
    for entry_name, entry in section.get("expression", {}).items():
        where = f"body forces.expression.{entry_name}"
        resid_name, *exprs = entry
        r = _resid_idx(resid_name, gr, where)
        ncomp = int(gr._num_eqs[r])
        if len(exprs) != ncomp:
            raise ValueError(
                f"{where}: {resid_name!r} takes {ncomp} components; got "
                f"{len(exprs)}")
        if r in out:
            raise ValueError(
                f"{where}: residual {resid_name!r} already has a "
                f"body-force entry")
        fns = [parse_scalar_expression(e, _COORD_NAMES) for e in exprs]

        def body(coords, t, fns=fns):
            return jnp.stack([jnp.asarray(f(
                x=coords[0], y=coords[1], z=coords[2], t=t))
                for f in fns])

        out[r] = body
    return out


def _load_t_schedule(disc) -> np.ndarray:
    if "times" in disc:
        return np.asarray(disc["times"], dtype=np.float64).ravel()
    if "times file" in disc:
        path = Path(disc["times file"])
        suffix = path.suffix.lower()
        if suffix == ".npy":
            return np.load(path).astype(np.float64).ravel()
        if suffix in (".txt", ".csv"):
            return np.loadtxt(path).astype(np.float64).ravel()
        raise ValueError(
            f"discretization.times file: unsupported extension "
            f"{suffix!r}")
    n = int(disc["num steps"])
    dt = float(disc["step size"])
    return np.arange(n + 1, dtype=np.float64) * dt
