"""Input-convex NN (softplus ICNN) + affine feature scaler.

Parity: reference ``cmad/neural_networks/input_convex_neural_network.py``.
Used as the NN-discrepancy term of hybrid yield surfaces; convexity in the
input preserves yield-surface convexity. Parameters live inside the
Parameters pytree so calibration trains them like material constants.
"""
from __future__ import annotations

from functools import partial

import jax.numpy as jnp
import numpy as np
from jax.nn import softplus


class AffineScaler:
    """Per-feature affine map onto a target range (default (-1, 1)).

    ``fit`` sets ``scale_``/``min_`` so ``scale_ * x + min_`` maps the
    fitted data's feature columns onto ``feature_range``; constant features
    map to the range minimum.
    """

    def __init__(self, feature_range=(-1.0, 1.0)):
        self.feature_range = feature_range

    def fit(self, samples):
        low, high = self.feature_range
        samples = np.asarray(samples, dtype=float)
        lo = samples.min(axis=0)
        rng = samples.max(axis=0) - lo
        rng[rng == 0.0] = 1.0
        self.scale_ = (high - low) / rng
        self.min_ = low - lo * self.scale_
        return self


def forward(x, params):
    """ICNN forward: passthrough x-weights at every layer, nonnegative
    z-weights between hidden layers."""
    *x_hidden, x_last = params["x params"]
    *z_hidden, z_last = params["z params"]

    z = softplus(x @ x_hidden[0]["weights"] + x_hidden[0]["biases"])
    for x_layer, z_layer in zip(x_hidden[1:], z_hidden, strict=False):
        z = softplus(z @ z_layer["weights"] + x @ x_layer["weights"]
                     + x_layer["biases"])
    return z @ z_last["weights"] + x @ x_last["weights"] + x_last["biases"]


def input_symmetric_forward(x, params):
    """Symmetrized, zero-centered forward: even in x, zero at x = 0."""
    f0 = forward(jnp.zeros_like(x), params)
    return 0.5 * ((forward(x, params) - f0) + (forward(-x, params) - f0))


def input_symmetric_forward_with_offset(x, params, input_scaler, output_scaler):
    xs = input_scaler.scale_ * x + input_scaler.min_
    scaled = input_symmetric_forward(xs, params)
    return (scaled - output_scaler.min_) / output_scaler.scale_


def forward_with_offset(x, params, input_scaler, output_scaler):
    xs = input_scaler.scale_ * x + input_scaler.min_
    scaled = forward(xs, params) - forward(jnp.zeros_like(xs), params)
    return (scaled - output_scaler.min_) / output_scaler.scale_


class InputConvexNeuralNetwork:

    def __init__(self, layer_widths: list[int],
                 input_scaler: AffineScaler, output_scaler: AffineScaler,
                 seed: int = 22):
        self._init_params(layer_widths, seed)
        self.evaluate = partial(input_symmetric_forward_with_offset,
                                input_scaler=input_scaler,
                                output_scaler=output_scaler)

    def _init_params(self, layer_widths: list[int], seed: int) -> None:
        rng = np.random.RandomState(seed)
        n_x = len(layer_widths) - 1
        d_in = layer_widths[0]

        x_params = []
        for n_out in layer_widths[1:]:
            x_params.append(dict(
                weights=rng.normal(size=(d_in, n_out)) * np.sqrt(2.0 / d_in),
                biases=np.ones(n_out)))

        z_params = []
        for n_in, n_out in zip(layer_widths[1:-1], layer_widths[2:],
                               strict=False):
            z_params.append(dict(
                weights=np.abs(rng.normal(size=(n_in, n_out))
                               * np.sqrt(2.0 / n_in))))

        assert len(x_params) == n_x
        self.x_params = x_params
        self.z_params = z_params
