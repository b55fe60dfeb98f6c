"""Uniaxial-stress forward drives of the HYBRID Hill+ICNN Al-7079 model.

Parity: reference
``cmad/calibrations/al7079/nn_hill_uniaxial_stress_forward.py:1-164`` —
the one reference workload that exercises the beta-scaling inner Newton
(``scaled_effective_stress`` + ``beta_make_newton_solve``) inside a
full return-map drive: the ICNN discrepancy model (fit against the
Barlat-vs-Hill gap, ``fit_hybrid_icnn_effective_stress.py``) is added
to the Hill yield, homogenized back to degree one by the inner beta
Newton (phi(beta sigma) = Y), and driven through the UNIAXIAL_STRESS
``SmallElasticPlastic`` return map at every slab specimen rotation.

TPU-first differences from the reference script:

- the reference loads a pickled ICNN (``nn_props_16.p``) and loops
  rotations/steps in Python with per-step ``newton_solve`` calls; here
  the ICNN is fit in-process (or passed in), and ALL rotations x steps
  run as one ``jit(vmap(scan))`` — the inner beta Newton, the local
  return-map Newton, and the yield-normal ``grad`` all live inside the
  single fused program;
- no matplotlib: the curves, off-axis plastic strains, and strain
  ratios return as arrays (callers plot or assert).

The reference's own sanity check is kept: the off-axis Cauchy entries
must vanish (uniaxial stress is enforced by the extra stretch dofs),
asserted in ``tests/calibrations/test_nn_hill_uniaxial_forward.py``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cmad_tpu.calibrations.al7079.support import (
    params_hill_voce,
    slab_data,
)
from cmad_tpu.models.deformation_types import DefType
from cmad_tpu.models.effective_stress import (
    hybrid_hill_effective_stress,
    make_safe_update_fun,
    scaled_hybrid_hill_effective_stress,
)
from cmad_tpu.models.global_fields import mp_U_from_F
from cmad_tpu.models.nonlinear_solver import make_newton_solve
from cmad_tpu.models.small_elastic_plastic import SmallElasticPlastic

NUM_STEPS = 200
MAX_STRAIN = 0.1  # the reference's 5 * 0.02 ramp


def make_scaled_hybrid_es_fun(nn_eval):
    """``es_fun(cauchy, plastic_params)`` — the degree-one homogenized
    hybrid Hill+ICNN yield the model consumes, with the J2~0 guard
    around the inner beta Newton.

    The scaling target Y is read from the params ARGUMENT inside the
    beta residual (not captured in the closure like the reference's
    ``beta_make_newton_solve(fun, Y)``): the residual is wrapped in a
    ``custom_jvp``, whose closure must hold constants only — capturing
    the traced parameter-tree Y there leaks a tracer into the cond
    lowering ("No constant handler"). Routing Y through params also
    keeps the scaling differentiable w.r.t. Y for calibration."""
    hybrid = partial(hybrid_hill_effective_stress, nn_fun=nn_eval)

    def beta_residual(beta, cauchy, plastic):
        Y = plastic["flow stress"]["initial yield"]["Y"]
        return hybrid(beta * cauchy, plastic) / Y - 1.0

    solve = make_newton_solve(beta_residual, 10, 1e-14, 1e-14)
    safe_update = partial(make_safe_update_fun, update_fun=solve)
    return partial(scaled_hybrid_hill_effective_stress, nn_fun=nn_eval,
                   safe_update=safe_update)


def build_hybrid_model(parameters, nn_eval) -> SmallElasticPlastic:
    """UNIAXIAL_STRESS hybrid model, load along specimen axis 1 (the
    slab families' sigma_22 convention, as the Hill-only driver)."""
    return SmallElasticPlastic(
        parameters, def_type=DefType.UNIAXIAL_STRESS,
        uniaxial_stress_idx=1,
        effective_stress_fun=make_scaled_hybrid_es_fun(nn_eval))


def _uniaxial_F(num_steps: int, max_strain: float):
    eps = np.linspace(0.0, max_strain, num_steps + 1)
    return jnp.asarray((1.0 + eps)[:, None, None])


def forward_curves(nn_params, nn_eval, parameters=None,
                   families=("alpha", "beta", "gamma"),
                   num_steps: int = NUM_STEPS,
                   max_strain: float = MAX_STRAIN):
    """Batched hybrid forward drives over every rotation of the given
    slab families.

    Returns a dict of numpy arrays over the stacked rotations (first
    axis n_exp = sum of family sizes):

    - ``strain``: (num_steps + 1,) axial strain grid
    - ``stress``: (n_exp, num_steps + 1) axial Cauchy stress
    - ``off_axis_norm``: (n_exp,) max |off-axis Cauchy| over the drive
      (must sit at the Newton tolerance — uniaxial enforcement)
    - ``plastic_strain_xx`` / ``plastic_strain_zz``:
      (n_exp, num_steps) off-axis plastic strains (elastic part
      removed, reference convention)
    - ``strain_ratio``: (n_exp,) terminal off-axis plastic strain ratio
    """
    parameters = parameters or params_hill_voce(hill_active=False)
    values = dict(parameters.values)
    plastic = {**values["plastic"]}
    es = {**plastic["effective stress"], "neural network": nn_params}
    plastic["effective stress"] = es
    values["plastic"] = plastic

    E = float(values["elastic"]["E"])
    nu = float(values["elastic"]["nu"])

    Rs = []
    for family in families:
        _angles, _sig, _ratio, R_fam = slab_data(family)
        Rs.extend(R_fam)
    R_stack = jnp.stack([jnp.asarray(R) for R in Rs])

    model = build_hybrid_model(parameters, nn_eval)
    # the hybrid residual's inner beta Newton needs the looser local
    # tolerances the reference also uses (its newton_solve is called
    # with abs/rel 1e-13 instead of machine-eps targets)
    solve = make_newton_solve(model.residual_fun, abs_tol=1e-13,
                              rel_tol=1e-13)
    F_steps = _uniaxial_F(num_steps, max_strain)
    stretch_slc = model.layout.slc("off-axis stretches")

    def run_one(R):
        params = {**values, "rotation matrix": R}

        def step(xi_prev, inputs):
            F_now, F_prev = inputs
            U, U_prev = mp_U_from_F(F_now), mp_U_from_F(F_prev)
            xi = solve(xi_prev, xi_prev, params, U, U_prev)
            sigma = model.cauchy_fun(xi, xi_prev, params, U, U_prev)
            return xi, (sigma, xi[stretch_slc])

        _, (sigmas, stretches) = lax.scan(
            step, model.init_xi(), (F_steps[1:], F_steps[:-1]))
        return sigmas, stretches

    sigmas, stretches = jax.jit(jax.vmap(run_one))(R_stack)

    sigmas = np.asarray(sigmas)             # (n_exp, T, 3, 3)
    stretches = np.asarray(stretches)       # (n_exp, T, 2)
    axial = sigmas[:, :, 1, 1]
    off_mask = np.ones((3, 3), dtype=bool)
    off_mask[1, 1] = False
    off_axis_norm = np.abs(sigmas[:, :, off_mask]).max(axis=(1, 2))

    off_axis_elastic = -axial * nu / E      # (n_exp, T)
    p_xx = stretches[:, :, 0] - 1.0 - off_axis_elastic
    p_zz = stretches[:, :, 1] - 1.0 - off_axis_elastic
    strain_ratio = p_zz[:, -1] / p_xx[:, -1]

    strain = np.linspace(0.0, max_strain, num_steps + 1)
    stress = np.concatenate(
        [np.zeros((axial.shape[0], 1)), axial], axis=1)
    return {"strain": strain, "stress": stress,
            "off_axis_norm": off_axis_norm,
            "plastic_strain_xx": p_xx, "plastic_strain_zz": p_zz,
            "strain_ratio": strain_ratio}


def main() -> None:
    from cmad_tpu.calibrations.al7079.fit_hybrid_icnn_effective_stress import (  # noqa: E501
        fit,
    )

    nn_params, rms, nn_eval = fit()
    print(f"hybrid ICNN: train RMS discrepancy {rms:.3f} (stress units)")
    out = forward_curves(nn_params, nn_eval)
    n = 0
    for family in ("alpha", "beta", "gamma"):
        angles, _s, _r, Rs = slab_data(family)
        for angle in np.degrees(np.asarray(angles)):
            print(f"{family} {angle:5.1f} deg: terminal stress "
                  f"{out['stress'][n, -1]:8.2f}, plastic strain ratio "
                  f"{out['strain_ratio'][n]:7.4f}, max off-axis "
                  f"|sigma| {out['off_axis_norm'][n]:.2e}")
            n += 1


if __name__ == "__main__":
    main()
