"""NN yield-surface building blocks: scaler, ICNN convexity/symmetry,
simple MLP zero-centering.

Mirrors the reference's ``tests/neural_networks`` intent (AffineScaler
behavior) and adds the structural properties the hybrid yield surfaces
rely on: input convexity, evenness, and f(0) = 0.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cmad_tpu.neural_networks import input_convex_neural_network as icnn
from cmad_tpu.neural_networks import simple_neural_network as snn
from cmad_tpu.neural_networks.input_convex_neural_network import (
    AffineScaler,
    InputConvexNeuralNetwork,
)
from cmad_tpu.neural_networks.simple_neural_network import (
    SimpleNeuralNetwork,
)


def _icnn_params(widths=(2, 8, 8, 1), seed=3):
    net = InputConvexNeuralNetwork(list(widths), AffineScaler().fit(
        np.array([[-1.0, -1.0], [1.0, 1.0]])), AffineScaler().fit(
        np.array([[0.0], [1.0]])), seed=seed)
    return {"x params": net.x_params, "z params": net.z_params}


def test_affine_scaler_maps_range():
    samples = np.array([[0.0, -2.0, 5.0],
                        [10.0, 2.0, 5.0],
                        [5.0, 0.0, 5.0]])
    sc = AffineScaler(feature_range=(-1.0, 1.0)).fit(samples)
    mapped = sc.scale_ * samples + sc.min_
    np.testing.assert_allclose(mapped.min(axis=0)[:2], [-1.0, -1.0])
    np.testing.assert_allclose(mapped.max(axis=0)[:2], [1.0, 1.0])
    # constant features map to the range minimum, never divide by zero
    np.testing.assert_allclose(mapped[:, 2], -1.0)


def test_affine_scaler_custom_range():
    samples = np.array([[1.0], [3.0]])
    sc = AffineScaler(feature_range=(0.0, 2.0)).fit(samples)
    mapped = sc.scale_ * samples + sc.min_
    np.testing.assert_allclose(mapped.ravel(), [0.0, 2.0])


def test_icnn_forward_is_convex_in_input():
    """Midpoint convexity f((a+b)/2) <= (f(a)+f(b))/2 on random pairs:
    the structural guarantee (nonnegative z-weights + convex
    nondecreasing softplus) hybrid yield surfaces rely on."""
    params = _icnn_params()
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.normal(size=(64, 2)))
    b = jnp.asarray(rng.normal(size=(64, 2)))
    f = lambda x: np.asarray(icnn.forward(x, params)).ravel()  # noqa: E731
    lhs = f(0.5 * (a + b))
    rhs = 0.5 * (f(a) + f(b))
    assert np.all(lhs <= rhs + 1e-12)


def test_icnn_symmetric_forward_is_even_and_zero_at_origin():
    params = _icnn_params(seed=9)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.normal(size=(16, 2)))
    fx = np.asarray(icnn.input_symmetric_forward(x, params))
    fmx = np.asarray(icnn.input_symmetric_forward(-x, params))
    np.testing.assert_allclose(fx, fmx, atol=1e-12)
    f0 = np.asarray(icnn.input_symmetric_forward(jnp.zeros((1, 2)),
                                                 params))
    np.testing.assert_allclose(f0, 0.0, atol=1e-12)


def test_icnn_z_weights_initialized_nonnegative():
    net = InputConvexNeuralNetwork([2, 4, 4, 1], AffineScaler().fit(
        np.eye(2)), AffineScaler().fit(np.array([[0.0], [1.0]])))
    assert len(net.x_params) == 3
    assert len(net.z_params) == 2
    for layer in net.z_params:
        assert np.all(layer["weights"] >= 0.0)


def test_simple_nn_offset_forward_zero_at_origin():
    net = SimpleNeuralNetwork([3, 6, 1], input_scale=0.1,
                              output_scale=50.0)
    f0 = np.asarray(net.evaluate(jnp.zeros((1, 3)), net.params))
    np.testing.assert_allclose(f0, 0.0, atol=1e-12)
    x = jnp.asarray(np.random.RandomState(2).normal(size=(4, 3)))
    fx = np.asarray(net.evaluate(x, net.params))
    assert fx.shape == (4, 1)
    assert np.abs(fx).max() > 0.0


def test_simple_nn_is_differentiable():
    import jax

    net = SimpleNeuralNetwork([2, 4, 1])
    g = jax.grad(lambda x: snn.forward_with_offset(
        x, net.params, 1.0, 1.0).sum())(jnp.ones(2))
    assert g.shape == (2,)
    assert np.all(np.isfinite(np.asarray(g)))
