"""Component-major per-IP state carrier for the FE drive.

The J2 COUPLED fast path (``fem/j2_block.py``) evaluates the per-IP
return map through the component-major (SoA) kernel
(``ops/j2_soa_ad.py``), whose natural state layout is ``(8, E*Q)`` —
one lane-contiguous row per state component. The round-3 wiring kept
the FE-facing state AoS ``(E, Q, 7)`` and paid a pack (transpose) on
the way in and an unpack on the way out of EVERY block evaluation —
per Newton iteration, per line-search probe, per time step. Measured
round 4 that boundary cost 4.5x the kernel itself
(``BENCH_r04.json``: 10.37 G updates/s for the pure SoA chain vs
2.30 G through the per-step pack/unpack; the wide-layout experiment in
``benchmarks/local_kernels/README.md`` independently measured boundary
relayouts at ~4x the kernel).

This module makes the carrier layout a property of the TRAJECTORY
instead of the call: drivers pack each opted-in block's state once at
entry (``pack_xi_by_block``), every Newton iteration and every time
step then carries and consumes the ``(8, E*Q)`` rows directly (zero
relayouts in the hot loop — for the rate form the kernel's output IS
the next step's input), and the history is unpacked back to the
public AoS layout only where it is materialized (``FEState``, stacked
scan outputs).

A block opts in by setting ``"xi_carrier": True`` in its evaluators
dict and accepting both layouts in its ``block_*`` evaluators
(detected by ``xi_prev.ndim == 2``); everything between the drivers
and the block kernels — assembly, the FE Newton, the IFT rules, the
stepped adjoint, QoI closures that feed xi back into assembly — is
layout-agnostic and needs no change.

Layout contract (both model kinds): carrier row ``c`` holds AoS
component ``c`` flattened over the ``(E, Q)`` point batch in C order;
row 7 is zero padding (the SoA kernel's sublane-aligned 8th row).
``unpack(pack(x)) == x`` exactly; pack/unpack are linear, so AD flows
through them.

Reference context: the reference carries AoS per-IP state through its
assembly (``cmad/fem/assembly.py:416-537``); the carrier is a
TPU-first replacement, equivalence pinned by
``tests/fem/test_j2_block_fastpath.py`` and the driver-parity suite.
"""
from __future__ import annotations

import jax.numpy as jnp

from cmad_tpu.typing import JaxArray


def pack_xi(xi_aos: JaxArray) -> JaxArray:
    """AoS ``(E, Q, nxi)`` -> component-major ``(nxi + 1, E*Q)`` with a
    zero padding row (the SoA kernel's 8-row state block)."""
    E, Q, nxi = xi_aos.shape
    rows = xi_aos.reshape(E * Q, nxi).T
    return jnp.concatenate(
        [rows, jnp.zeros((1, E * Q), dtype=xi_aos.dtype)])


def unpack_xi(xi_carrier: JaxArray, E: int, Q: int) -> JaxArray:
    """Inverse of :func:`pack_xi`: ``(nxi + 1, E*Q)`` -> ``(E, Q, nxi)``
    (the padding row is dropped)."""
    nxi = xi_carrier.shape[0] - 1
    return xi_carrier[:nxi].T.reshape(E, Q, nxi)


def carrier_blocks(fe_problem) -> dict[str, tuple[int, int]]:
    """``block_name -> (E, Q)`` for blocks whose evaluators opt into
    the component-major carrier."""
    out: dict[str, tuple[int, int]] = {}
    geom = fe_problem.kernel_arrays.geometry_cache
    for b, ev in fe_problem.evaluators_by_block.items():
        if ev.get("xi_carrier"):
            det = geom[b]["per_elem"]["iso_jac_det"]
            out[b] = (int(det.shape[0]), int(det.shape[1]))
    return out


def pack_xi_by_block(fe_problem, xi_by_block):
    """Pack every opted-in block's AoS state; non-carrier blocks (and
    already-packed arrays, detected by ndim) pass through unchanged."""
    cb = carrier_blocks(fe_problem)
    return {b: (pack_xi(v) if b in cb and v.ndim == 3 else v)
            for b, v in xi_by_block.items()}


def unpack_xi_by_block(fe_problem, xi_by_block):
    """Unpack every opted-in block's carrier state back to AoS;
    non-carrier blocks (and already-AoS arrays) pass through."""
    cb = carrier_blocks(fe_problem)
    return {b: (unpack_xi(v, *cb[b]) if b in cb and v.ndim == 2 else v)
            for b, v in xi_by_block.items()}


def unpack_xi_steps_by_block(fe_problem, xi_steps_by_block):
    """Unpack stacked histories (leading time axis): carrier
    ``(T, 8, E*Q)`` -> AoS ``(T, E, Q, 7)`` in one fused relayout per
    block instead of one per step."""
    cb = carrier_blocks(fe_problem)

    def _unpack_steps(b, v):
        # stacked carrier is (T, 8, E*Q) = ndim 3; stacked AoS is
        # (T, E, Q, nxi) = ndim 4 and passes through
        if b in cb and v.ndim == 3:
            E, Q = cb[b]
            nxi = v.shape[1] - 1
            return jnp.moveaxis(v[:, :nxi, :], 1, -1).reshape(
                v.shape[0], E, Q, nxi)
        return v

    return {b: _unpack_steps(b, v) for b, v in xi_steps_by_block.items()}
