"""Expression-parser permutation grid: accepted forms, sandbox
rejections, and jax-traceability of every accepted form.

Deepens the io coverage of ``cmad_tpu/io/expressions.py`` (reference
``cmad/io/expressions.py``): the sandbox must reject escape attempts
by NAME (not crash), and accepted expressions must be exact and
differentiable under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.io.expressions import (
    ExpressionError,
    parse_scalar_expression,
)

_NAMES = ("x", "y", "z", "t")

_ACCEPTED = [
    ("0.0", dict(x=0.1, y=0.2, z=0.3, t=0.4), 0.0),
    ("3", dict(x=0.0, y=0.0, z=0.0, t=0.0), 3.0),
    ("0.003 * t", dict(x=0.0, y=0.0, z=0.0, t=2.0), 0.006),
    ("x + 2*y - z", dict(x=1.0, y=2.0, z=3.0, t=0.0), 2.0),
    ("sin(pi*x)", dict(x=0.5, y=0.0, z=0.0, t=0.0), 1.0),
    ("cos(pi*y)*exp(-t)", dict(x=0.0, y=0.0, z=0.0, t=0.0), 1.0),
    ("sqrt(x**2 + y**2)", dict(x=3.0, y=4.0, z=0.0, t=0.0), 5.0),
    ("tanh(10*t)", dict(x=0.0, y=0.0, z=0.0, t=100.0), 1.0),
    ("Abs(x)", dict(x=-2.5, y=0.0, z=0.0, t=0.0), 2.5),
]


@pytest.mark.parametrize("expr,args,expected", _ACCEPTED,
                         ids=[c[0] for c in _ACCEPTED])
def test_accepted_expression_value(expr, args, expected):
    fn = parse_scalar_expression(expr, _NAMES)
    jitted = jax.jit(lambda x, y, z, t: fn(x=x, y=y, z=z, t=t))
    val = float(jitted(*(jnp.asarray(v) for v in args.values())))
    assert np.isclose(val, expected, atol=1e-12)


def test_accepted_expression_is_differentiable():
    fn = parse_scalar_expression("sin(pi*x) * t", _NAMES)

    def f(x):
        return fn(x=x, y=0.0, z=0.0, t=2.0)

    g = float(jax.grad(f)(jnp.asarray(0.0)))
    assert np.isclose(g, 2.0 * np.pi, rtol=1e-10)


_REJECTED = [
    "__import__('os').system('true')",
    "open('/etc/passwd')",
    "exec('x = 1')",
    "eval('1+1')",
    "mystery_function(x)",
    "q + 1",                 # free symbol outside the name set
    "x +",                   # syntax error
]


@pytest.mark.parametrize("expr", _REJECTED)
def test_rejected_expression(expr):
    with pytest.raises(ExpressionError):
        parse_scalar_expression(expr, _NAMES)


def test_boolean_and_non_string_rejected():
    with pytest.raises(ExpressionError, match="boolean"):
        parse_scalar_expression(True, _NAMES)
    with pytest.raises(ExpressionError, match="string or numeric"):
        parse_scalar_expression([1, 2], _NAMES)


def test_numeric_literal_ignores_coordinates():
    fn = parse_scalar_expression(7, _NAMES)
    assert fn(x=123.0, y=0.0, z=0.0, t=9.0) == 7.0


def test_non_finite_literal_rejected():
    for bad in (float("inf"), float("-inf"), float("nan")):
        with pytest.raises(ExpressionError, match="non-finite"):
            parse_scalar_expression(bad, _NAMES)


def test_scientific_notation_and_negative_literal_strings():
    fn = parse_scalar_expression("-2.5e-3", _NAMES)
    val = float(fn(x=0.0, y=0.0, z=0.0, t=0.0))
    assert np.isclose(val, -2.5e-3)


def test_euler_constant_available():
    fn = parse_scalar_expression("E", _NAMES)
    assert np.isclose(float(fn(x=0.0, y=0.0, z=0.0, t=0.0)), np.e)


def test_missing_kwarg_raises_expression_error():
    fn = parse_scalar_expression("x + t", _NAMES)
    with pytest.raises(ExpressionError, match="keyword argument"):
        fn(x=1.0, y=0.0, z=0.0)  # t missing


def test_getattr_and_dunder_rejected():
    for expr in ("getattr(x, 'real')", "x.__class__"):
        with pytest.raises(ExpressionError):
            parse_scalar_expression(expr, _NAMES)


def test_repeated_calls_consistent_and_parsers_independent():
    f1 = parse_scalar_expression("x * t", _NAMES)
    f2 = parse_scalar_expression("x + t", _NAMES)
    args = dict(x=3.0, y=0.0, z=0.0, t=2.0)
    for _ in range(3):
        assert float(f1(**args)) == 6.0
        assert float(f2(**args)) == 5.0


def test_unused_name_is_harmless():
    fn = parse_scalar_expression("y", _NAMES)
    assert float(fn(x=99.0, y=4.0, z=98.0, t=97.0)) == 4.0
