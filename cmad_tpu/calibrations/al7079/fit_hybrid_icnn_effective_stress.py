"""Fit an ICNN discrepancy so the hybrid Hill+NN yield matches Barlat.

Parity: reference
``cmad/calibrations/al7079/fit_hybrid_icnn_effective_stress.py``: train
the input-convex network inside the parameter pytree so that
``hill + NN(s_dev)`` reproduces the published Yld2004-18p surface on
sampled deviatoric stress directions. Fully traced training loop (optax
adam) — the NN weights are ordinary calibration parameters.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cmad_tpu.calibrations.al7079.support import (
    calibrated_barlat_coefficients,
    calibrated_hill_coefficients,
)
from cmad_tpu.models.effective_stress import hybrid_hill_effective_stress
from cmad_tpu.neural_networks.input_convex_neural_network import (
    AffineScaler,
    InputConvexNeuralNetwork,
    input_symmetric_forward_with_offset,
)
from cmad_tpu.verification.functions import jax_barlat_yield, jax_hill_yield


def sample_unit_deviators(n: int, seed: int = 0) -> np.ndarray:
    """Random symmetric deviators with unit von Mises norm."""
    rng = np.random.RandomState(seed)
    A = rng.normal(size=(n, 3, 3))
    S = 0.5 * (A + np.swapaxes(A, -1, -2))
    S = S - np.trace(S, axis1=-2, axis2=-1)[:, None, None] / 3.0 * np.eye(3)
    vm = np.sqrt(1.5 * np.sum(S * S, axis=(-2, -1)))
    return S / vm[:, None, None]


def fit(n_samples: int = 512, n_epochs: int = 400, lr: float = 1e-2,
        stress_scale: float = 500.0, seed: int = 0):
    """Returns (nn_params, rms train error in stress units)."""
    S = sample_unit_deviators(n_samples, seed) * stress_scale
    S_jax = jnp.asarray(S)

    barlat = calibrated_barlat_coefficients()
    hill = calibrated_hill_coefficients()
    target = jax.vmap(lambda s: jax_barlat_yield(s, jnp.asarray(barlat))
                      - jax_hill_yield(s, jnp.asarray(hill)))(S_jax)

    flat = jnp.stack([S_jax[:, 0, 0], S_jax[:, 1, 1], S_jax[:, 2, 2],
                      S_jax[:, 0, 1], S_jax[:, 0, 2], S_jax[:, 1, 2]],
                     axis=-1)
    in_scaler = AffineScaler().fit(np.asarray(flat))
    out_scaler = AffineScaler().fit(np.asarray(target)[:, None])

    icnn = InputConvexNeuralNetwork([6, 16, 16, 1], in_scaler, out_scaler,
                                    seed=seed)
    params0 = {"x params": [
        {k: jnp.asarray(v) for k, v in layer.items()}
        for layer in icnn.x_params],
        "z params": [{k: jnp.asarray(v) for k, v in layer.items()}
                     for layer in icnn.z_params]}

    def nn_eval(x, p):
        return input_symmetric_forward_with_offset(
            x, p, input_scaler=in_scaler, output_scaler=out_scaler)

    def loss(p):
        pred = jax.vmap(lambda f: nn_eval(f, p)[0])(flat)
        return jnp.mean((pred - target) ** 2)

    opt = optax.adam(lr)
    state = opt.init(params0)

    @jax.jit
    def step(p, s):
        val, g = jax.value_and_grad(loss)(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, val

    p = params0
    for _ in range(n_epochs):
        p, state, val = step(p, state)
    return p, float(jnp.sqrt(val)), nn_eval


def main() -> None:
    nn_params, rms, nn_eval = fit()
    print(f"hybrid ICNN fit: train RMS discrepancy error = {rms:.3f} "
          f"(stress units; Barlat-Hill gap is O(10))")

    # evaluate the hybrid yield through the model-facing API
    hill = calibrated_hill_coefficients()
    params = {"effective stress": {
        "hill": dict(zip("FGHLMN", hill, strict=True)),
        "neural network": nn_params}}
    S = jnp.asarray(sample_unit_deviators(8, seed=3) * 500.0)
    barlat = jnp.asarray(calibrated_barlat_coefficients())
    for s in S[:3]:
        phi_h = float(hybrid_hill_effective_stress(s, params, nn_eval))
        phi_b = float(jax_barlat_yield(s, barlat))
        print(f"  hybrid {phi_h:8.2f} vs barlat {phi_b:8.2f}")


if __name__ == "__main__":
    main()
