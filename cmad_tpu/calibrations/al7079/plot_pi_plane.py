"""Plot Al-7079 yield surfaces on the deviatoric pi-plane.

Parity: reference ``cmad/calibrations/al7079/plot_pi_plane.py``. Traces
the Hill and Barlat surfaces at the published coefficients by scaling
pi-plane rays to the yield locus.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cmad_tpu.calibrations.al7079.support import (
    calibrated_barlat_coefficients,
    calibrated_hill_coefficients,
)
from cmad_tpu.util.dev_plane_transformations import (
    compute_forward_and_backward_matrices,
    setup_dev_plane_plot,
)
from cmad_tpu.verification.functions import jax_barlat_yield, jax_hill_yield


def yield_locus(yield_fun, coeffs, Y: float, n_angles: int = 256):
    """Pi-plane (x, y) points where phi(sigma) = Y along each ray."""
    _, backward = compute_forward_and_backward_matrices()
    angles = np.linspace(0.0, 2.0 * np.pi, n_angles, endpoint=False)
    rays = np.stack([np.cos(angles), np.sin(angles)], axis=1)
    principals = rays @ backward.T                      # (n, 3)

    def phi_of_unit(p):
        sigma = jnp.diag(jnp.asarray(p))
        return yield_fun(sigma, coeffs)

    phis = jax.vmap(phi_of_unit)(jnp.asarray(principals))
    radii = Y / np.asarray(phis)
    return rays * radii[:, None]


def main(out_path: str = "al7079_pi_plane.png") -> None:
    Y = 525.0
    hill = jnp.asarray(calibrated_hill_coefficients())
    barlat = jnp.asarray(calibrated_barlat_coefficients())

    fig, ax = setup_dev_plane_plot(axis_scale_factor=700.0)
    for name, fun, coeffs in (("Hill", jax_hill_yield, hill),
                              ("Yld2004-18p", jax_barlat_yield, barlat)):
        locus = yield_locus(fun, coeffs, Y)
        closed = np.vstack([locus, locus[:1]])
        ax.plot(closed[:, 0], closed[:, 1], label=name)
    ax.legend()
    ax.set_title("Al-7079 yield surfaces (pi-plane)")
    fig.savefig(out_path, dpi=120)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
