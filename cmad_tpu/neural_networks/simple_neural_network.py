"""Sigmoid MLP whose parameters live inside the Parameters pytree.

Parity: reference ``cmad/neural_networks/simple_neural_network.py:13-46``.
The forward is zero-centered (f(x) - f(0)) so an untrained network starts
as a null perturbation of the analytic yield surface.
"""
from __future__ import annotations

from functools import partial

import jax.numpy as jnp
import numpy as np
from jax.nn import sigmoid


def forward(x, params):
    *hidden, last = params
    for layer in hidden:
        x = sigmoid(x @ layer["weights"] + layer["biases"])
    return x @ last["weights"] + last["biases"]


def forward_with_offset(x, params, input_scale, output_scale):
    xs = input_scale * x
    return output_scale * (forward(xs, params)
                           - forward(jnp.zeros_like(xs), params))


class SimpleNeuralNetwork:
    """MLP with abs-initialized weights (monotone-friendly init)."""

    def __init__(self, layer_widths: list[int],
                 input_scale: float = 1.0, output_scale: float = 1.0,
                 seed: int = 22):
        self.params = self._init_params(layer_widths, seed)
        self.evaluate = partial(forward_with_offset,
                                input_scale=input_scale,
                                output_scale=output_scale)

    @staticmethod
    def _init_params(layer_widths: list[int], seed: int) -> list[dict]:
        rng = np.random.RandomState(seed)
        params = []
        for n_in, n_out in zip(layer_widths[:-1], layer_widths[1:],
                               strict=False):
            params.append(dict(
                weights=np.abs(rng.normal(size=(n_in, n_out))
                               * np.sqrt(2.0 / n_in)),
                biases=np.ones(n_out)))
        return params
