"""Property sweep: every specialized local solve equals the generic
7-dof IFT Newton across RANDOM material parameters and strain states —
hardening the dispatch contract beyond the fixed-fixture tests
(near-incompressible nu, low/high yield, strong/weak hardening)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.models.global_fields import GlobalFieldsAtPoint
from cmad_tpu.models.nonlinear_solver import make_newton_solve
from cmad_tpu.models.small_elastic_plastic import SmallElasticPlastic
from cmad_tpu.models.small_rate_elastic_plastic import (
    SmallRateElasticPlastic,
)
from cmad_tpu.parameters.parameters import Parameters

_B = 12


def _fields(grad_u):
    return GlobalFieldsAtPoint(
        fields={"u": jnp.zeros(3, dtype=grad_u.dtype)},
        grad_fields={"u": grad_u})


def _draw_material(rng):
    """Random but physical constants spanning the awkward corners."""
    E = 10.0 ** rng.uniform(3.0, 6.0)
    nu = rng.uniform(0.05, 0.49)       # up to near-incompressible
    Y = E * 10.0 ** rng.uniform(-4.0, -2.0)
    S = Y * 10.0 ** rng.uniform(-1.0, 1.0)
    D = 10.0 ** rng.uniform(0.0, 2.0)
    return E, nu, Y, S, D


def _es_section(kind, rng):
    if kind == "J2":
        return {"J2": 0.0}
    if kind == "hosford":
        return {"hosford": {"a": float(rng.choice([4.0, 8.0, 20.0]))}}
    if kind == "hosford_principal":
        return {"hosford_principal":
                {"a": float(rng.choice([4.0, 8.0, 20.0]))}}
    if kind == "hill":
        # coefficients in a moderate anisotropy band around isotropy
        c = {k: float(rng.uniform(0.35, 0.7)) for k in ("F", "G", "H")}
        c.update({k: float(rng.uniform(1.1, 1.9))
                  for k in ("L", "M", "N")})
        return {"hill": c}
    raise ValueError(kind)


def _reduced_solve(kind, model):
    if kind == "J2":
        from cmad_tpu.ops.return_map import (
            j2_voce_specializable,
            make_j2_radial_return_for,
        )
        assert j2_voce_specializable(model)
        radial = make_j2_radial_return_for(model, prefer_pallas=False)

        def solve(xi_guess, xi_prev, params, U, U_prev):
            xi, _ = radial(xi_prev, U.grad_fields["u"],
                           U_prev.grad_fields["u"], params)
            return xi

        return solve
    if kind == "hosford":
        from cmad_tpu.ops.hosford_return import (
            hosford_reducible,
            make_hosford_local_solve,
        )
        assert hosford_reducible(model)
        return make_hosford_local_solve(model, max_iters=40)
    if kind == "hosford_principal":
        from cmad_tpu.ops.principal_return import (
            make_principal_hosford_local_solve,
            principal_hosford_reducible,
        )
        assert principal_hosford_reducible(model)
        return make_principal_hosford_local_solve(model, max_iters=40)
    from cmad_tpu.ops.hill_return import (
        hill_reducible,
        make_hill_local_solve,
    )
    assert hill_reducible(model)
    return make_hill_local_solve(model, max_iters=40)


@pytest.mark.parametrize("cls", [SmallRateElasticPlastic,
                                 SmallElasticPlastic])
@pytest.mark.parametrize("kind", ["J2", "hosford", "hosford_principal",
                                  "hill"])
def test_random_materials_reduced_equals_generic(cls, kind):
    rng = np.random.RandomState(hash((kind, cls.__name__)) % 2**31)
    for trial in range(3):
        E, nu, Y, S, D = _draw_material(rng)
        params = Parameters({
            "rotation matrix": np.eye(3),
            "elastic": {"E": E, "nu": nu},
            "plastic": {
                "effective stress": _es_section(kind, rng),
                "flow stress": {"initial yield": {"Y": Y},
                                "hardening": {"voce": {"S": S,
                                                       "D": D}}}}})
        model = cls(params)
        generic = make_newton_solve(model.residual_fun, max_iters=60)
        reduced = _reduced_solve(kind, model)

        # strains straddling the yield strain Y/E for this draw
        ys = Y / E
        eps = rng.normal(0.0, 1.2 * ys, size=(_B, 3, 3))
        if kind == "hosford":
            # the diagonal reduction requires (nearly) diagonal stress
            eps = np.stack([np.diag(np.diag(e)) for e in eps])
        grad_u = jnp.asarray(eps)
        gu0 = jnp.zeros_like(grad_u)
        xi_prev = jnp.zeros((_B, model.num_dofs))

        xi_g = jax.vmap(lambda xp, g, g0: generic(
            xp, xp, params.values, _fields(g), _fields(g0)))(
            xi_prev, grad_u, gu0)
        xi_r = jax.vmap(lambda xp, g, g0: reduced(
            xp, xp, params.values, _fields(g), _fields(g0)))(
            xi_prev, grad_u, gu0)

        scale = max(1.0, float(np.abs(np.asarray(xi_g)).max()))
        np.testing.assert_allclose(
            np.asarray(xi_r), np.asarray(xi_g), rtol=2e-7,
            atol=1e-9 * scale,
            err_msg=f"{kind}/{cls.__name__} trial {trial}: "
                    f"E={E:.3g} nu={nu:.3g} Y={Y:.3g} S={S:.3g} "
                    f"D={D:.3g}")
