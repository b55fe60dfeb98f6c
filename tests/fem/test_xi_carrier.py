"""Component-major xi carrier (fem/xi_carrier.py) is a pure layout.

The drivers keep the J2 fast-path block's per-IP state in the SoA
kernel layout (8, E*Q) across the whole drive; the block evaluators
accept either layout and must produce BIT-IDENTICAL math — the packed
path feeds the very same kernel the AoS path packs into, so R, K and
the (unpacked) state agree exactly, not just to tolerance.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from cmad_tpu.fem.xi_carrier import (
    carrier_blocks,
    pack_xi,
    pack_xi_by_block,
    unpack_xi,
    unpack_xi_by_block,
    unpack_xi_steps_by_block,
)

from tests.fem.test_j2_block_fastpath import _plastic_U, _problem


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    xi = jnp.asarray(rng.normal(size=(5, 4, 7)).astype(np.float32))
    packed = pack_xi(xi)
    assert packed.shape == (8, 20)
    np.testing.assert_array_equal(np.asarray(packed[7]), 0.0)
    np.testing.assert_array_equal(np.asarray(unpack_xi(packed, 5, 4)),
                                  np.asarray(xi))


@pytest.mark.parametrize("kind", ["rate", "total"])
def test_block_kernels_layout_equivalent(kind):
    """carrier-in == AoS-in bit-exactly for both model kinds."""
    fe = _problem(kind=kind)
    assert carrier_blocks(fe) == {"all": (4, 8)}  # 2x2x1 hex, Q=8
    ev = fe.evaluators_by_block["all"]
    assert ev.get("xi_carrier") is True

    from cmad_tpu.fem.assembly import (
        gather_element_U,
        params_by_block_from_models,
    )

    params = params_by_block_from_models(fe)["all"]
    U = _plastic_U(fe)
    U_e = gather_element_U(U, fe.kernel_arrays, "all")[0]
    Up_e = jnp.zeros_like(U_e)
    geom = fe.kernel_arrays.geometry_cache["all"]
    E, Q = 4, 8
    rng = np.random.RandomState(1)
    xi_aos = jnp.asarray(
        1e-3 * rng.normal(size=(E, Q, 7)).astype(np.float32))
    xi_aos = xi_aos.at[..., 6].set(jnp.abs(xi_aos[..., 6]))

    R_a, K_a, xi_out_a = ev["block_R_and_K_and_xi"](
        params, U_e, Up_e, geom, None, 1.0, xi_aos)
    R_c, K_c, xi_out_c = ev["block_R_and_K_and_xi"](
        params, U_e, Up_e, geom, None, 1.0, pack_xi(xi_aos))

    np.testing.assert_array_equal(np.asarray(R_c), np.asarray(R_a))
    np.testing.assert_array_equal(np.asarray(K_c), np.asarray(K_a))
    assert xi_out_c.shape == (8, E * Q)
    np.testing.assert_array_equal(np.asarray(xi_out_c[7]), 0.0)
    np.testing.assert_array_equal(
        np.asarray(unpack_xi(xi_out_c, E, Q)), np.asarray(xi_out_a))

    R_only_a = ev["block_R"](params, U_e, Up_e, geom, None, 1.0, xi_aos)
    R_only_c = ev["block_R"](params, U_e, Up_e, geom, None, 1.0,
                             pack_xi(xi_aos))
    np.testing.assert_array_equal(np.asarray(R_only_c),
                                  np.asarray(R_only_a))
    # some points must actually be plastic for this to mean anything
    assert float(jnp.max(xi_out_a[..., 6])) > 0.0


def test_by_block_helpers_pass_through():
    fe = _problem()
    rng = np.random.RandomState(2)
    xi_aos = jnp.asarray(rng.normal(size=(4, 8, 7)).astype(np.float32))
    other = jnp.asarray(rng.normal(size=(3, 2, 9)).astype(np.float32))

    packed = pack_xi_by_block(fe, {"all": xi_aos, "ghost": other})
    assert packed["all"].shape == (8, 32)
    assert packed["ghost"] is other  # unknown block: untouched

    # idempotent: packing an already-packed dict is a no-op
    packed2 = pack_xi_by_block(fe, packed)
    assert packed2["all"] is packed["all"]

    back = unpack_xi_by_block(fe, packed)
    np.testing.assert_array_equal(np.asarray(back["all"]),
                                  np.asarray(xi_aos))
    # unpacking an AoS dict is a no-op
    assert unpack_xi_by_block(fe, {"all": xi_aos})["all"] is xi_aos

    # stacked history: (T, 8, n) -> (T, E, Q, 7); stacked AoS passes
    stacked_c = jnp.stack([pack_xi(xi_aos)] * 3)
    out = unpack_xi_steps_by_block(fe, {"all": stacked_c})
    assert out["all"].shape == (3, 4, 8, 7)
    np.testing.assert_array_equal(np.asarray(out["all"][1]),
                                  np.asarray(xi_aos))
    stacked_a = jnp.stack([xi_aos] * 3)
    assert unpack_xi_steps_by_block(
        fe, {"all": stacked_a})["all"] is stacked_a
