"""FE primitive units: quadrature exactness, interpolant consistency,
DOF numbering, BC conflict detection.

Parity: the reference's dedicated tests/fem/{test_quadrature,
test_interpolants,test_finite_element,test_dof,test_bcs}.py files.
"""
from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.fem.bcs import DirichletBC
from cmad_tpu.fem.dof import GlobalFieldLayout, build_dof_map
from cmad_tpu.fem.elements import (
    P1_TET,
    Q1_HEX,
    hex_linear,
    tet_linear,
)
from cmad_tpu.fem.mesh import StructuredHexMesh
from cmad_tpu.fem.quadrature import (
    hex_quadrature,
    quad_quadrature,
    tet_quadrature,
    tri_quadrature,
)


# ----------------------------------------------------------------------
# quadrature: rules integrate monomials exactly up to their degree
# ----------------------------------------------------------------------
def _monomial_integral_hex(p, q, r):
    """∫ over [-1,1]^3 of x^p y^q z^r."""
    def one(k):
        return 0.0 if k % 2 else 2.0 / (k + 1)
    return one(p) * one(q) * one(r)


@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5])
def test_hex_quadrature_exactness(degree):
    rule = hex_quadrature(degree)
    for p, q, r in itertools.product(range(degree + 1), repeat=3):
        if p + q + r > degree:
            continue
        val = float(np.sum(
            rule.w * rule.xi[:, 0]**p * rule.xi[:, 1]**q
            * rule.xi[:, 2]**r))
        assert abs(val - _monomial_integral_hex(p, q, r)) < 1e-12, \
            (degree, p, q, r)


def _monomial_integral_tet(p, q, r):
    """∫ over the unit tet of x^p y^q z^r (Dirichlet integral)."""
    from math import factorial
    return (factorial(p) * factorial(q) * factorial(r)
            / factorial(p + q + r + 3))


@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5, 6])
def test_tet_quadrature_exactness(degree):
    rule = tet_quadrature(degree)
    assert abs(float(np.sum(rule.w)) - 1.0 / 6.0) < 1e-13
    for p, q, r in itertools.product(range(degree + 1), repeat=3):
        if p + q + r > degree:
            continue
        val = float(np.sum(
            rule.w * rule.xi[:, 0]**p * rule.xi[:, 1]**q
            * rule.xi[:, 2]**r))
        assert abs(val - _monomial_integral_tet(p, q, r)) < 1e-12, \
            (degree, p, q, r)


@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5])
def test_surface_quadratures_integrate_constants(degree):
    quad = quad_quadrature(degree)
    tri = tri_quadrature(degree)
    assert abs(float(np.sum(quad.w)) - 4.0) < 1e-13
    assert abs(float(np.sum(tri.w)) - 0.5) < 1e-13


# ----------------------------------------------------------------------
# interpolants: partition of unity, Kronecker delta, AD-consistent grads
# ----------------------------------------------------------------------
@pytest.mark.parametrize("shape_fn,ref_nodes", [
    (hex_linear, np.array(list(itertools.product([-1, 1], repeat=3)))),
    (tet_linear, np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])),
])
def test_interpolant_partition_of_unity_and_grads(shape_fn, ref_nodes):
    rng = np.random.RandomState(0)
    for _ in range(5):
        xi = jnp.asarray(rng.uniform(0.05, 0.3, size=3))
        s = shape_fn(xi)
        assert abs(float(jnp.sum(s.N)) - 1.0) < 1e-14
        assert np.allclose(np.asarray(jnp.sum(s.grad_N, axis=0)), 0.0,
                           atol=1e-13)
        # gradients match AD of N
        J = jax.jacfwd(lambda x: shape_fn(x).N)(xi)
        assert np.allclose(np.asarray(J), np.asarray(s.grad_N),
                           atol=1e-13)


def test_interpolant_kronecker_delta():
    hex_nodes = np.array(list(itertools.product([-1.0, 1.0], repeat=3)))
    # internal hex vertex ordering differs from itertools product order:
    # verify each vertex evaluates to a one-hot, and that the set of
    # one-hot positions is a permutation
    hits = []
    for node in hex_nodes:
        N = np.asarray(hex_linear(jnp.asarray(node)).N)
        assert abs(N.max() - 1.0) < 1e-14 and abs(N.sum() - 1.0) < 1e-14
        hits.append(int(N.argmax()))
    assert sorted(hits) == list(range(8))

    tet_nodes = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    for node in tet_nodes:
        N = np.asarray(tet_linear(jnp.asarray(node)).N)
        assert abs(N.max() - 1.0) < 1e-14 and abs(N.sum() - 1.0) < 1e-14


def test_finite_element_side_basis_fns():
    """Every hex face references 4 vertices, every tet face 3, and the
    union over faces covers all vertices."""
    for fe, nsides, per_side, nverts in ((Q1_HEX, 6, 4, 8),
                                         (P1_TET, 4, 3, 4)):
        seen = set()
        for s in range(nsides):
            basis = fe.side_basis_fns(s)
            assert len(basis) == per_side
            seen.update(int(b) for b in basis)
        assert seen == set(range(nverts))


# ----------------------------------------------------------------------
# dof map: equation numbering and prescribed-value resolution
# ----------------------------------------------------------------------
def test_dof_numbering_formula():
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    bcs = [DirichletBC(["xmin_sides"], "u", [0], None)]
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], bcs,
                            {"u": 3})
    assert dof_map.num_total_dofs == 27 * 3
    presc = np.asarray(dof_map.prescribed_indices)
    # xmin face: 9 nodes x component 0
    assert presc.shape[0] == 9
    assert np.all(presc % 3 == 0)  # x-components only
    x = mesh.nodes[presc // 3]
    assert np.allclose(x[:, 0], 0.0)


def test_dof_overprescription_rejected():
    """Two BCs prescribing the same dof with conflicting values are
    recorded at build time and rejected when values are resolved."""
    mesh = StructuredHexMesh((1.0, 1.0, 1.0), (2, 2, 2))
    bcs = [
        DirichletBC(["xmin_sides"], "u", [0], [1.0]),
        DirichletBC(["ymin_sides"], "u", [0], [2.0]),  # edge overlap
    ]
    dof_map = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)], bcs,
                            {"u": 3})
    assert dof_map.overprescribed  # the shared edge dofs are flagged
    from cmad_tpu.fem.dof import build_dbc_arrays
    arrays = build_dbc_arrays(dof_map)
    with pytest.raises(ValueError):
        dof_map.evaluate_prescribed_values(arrays, 1.0)

    # agreeing values on the overlap are accepted
    bcs_ok = [
        DirichletBC(["xmin_sides"], "u", [0], [0.0]),
        DirichletBC(["ymin_sides"], "u", [0], [0.0]),
    ]
    dof_map2 = build_dof_map(mesh, [GlobalFieldLayout("u", Q1_HEX)],
                             bcs_ok, {"u": 3})
    vals = dof_map2.evaluate_prescribed_values(
        build_dbc_arrays(dof_map2), 1.0)
    assert np.allclose(np.asarray(vals), 0.0)
