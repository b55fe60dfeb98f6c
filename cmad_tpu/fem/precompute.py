"""Per-element-block reference-frame geometry cache.

Parity: reference ``cmad/fem/precompute.py:50-296``. Total-Lagrangian
geometry (iso-Jacobian dets, physical-frame field-shape gradients, IP
coords, element sizes) is solution-independent, so it is computed once at
FEProblem build. Stored as plain dict pytrees (vmap-friendly):

per-elem (leading element axis, ``in_axes=0``):
  ``{"iso_jac_det": (n_b, n_ip), "coords_ip": (n_b, n_ip, 3),
     "grad_N_phys": tuple[(n_b, n_ip, n_dofs_r, 3)], "h": (n_b,)}``
shared (element-invariant, ``in_axes=None``):
  ``{"quad_w": (n_ip,), "N": tuple[(n_ip, n_dofs_r)]}``
"""
from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from jax import vmap

from cmad_tpu.fem.dof import GlobalFieldLayout
from cmad_tpu.fem.mesh import Mesh, element_rms_edge_sizes
from cmad_tpu.ops.linalg import det3, inv3
from cmad_tpu.fem.quadrature import QuadratureRule
from cmad_tpu.fem.topology import ElementFamily


def precompute_block_geometry(
        mesh: Mesh,
        quadrature_by_family: dict[ElementFamily, QuadratureRule],
        field_layouts_per_block: Sequence[GlobalFieldLayout],
) -> dict[str, dict]:
    """Geometry cache per element block; see module docstring for layout.

    ``iso_jac_det`` is signed so inverted elements surface as Newton
    divergence instead of being silently absorbed.
    """
    rule = quadrature_by_family[mesh.element_family]
    quad_xi = jnp.asarray(rule.xi)
    quad_w = jnp.asarray(rule.w)

    geom_fn = mesh.geometric_finite_element.interpolant_fn
    geom = vmap(geom_fn)(quad_xi)            # N (n_ip, ng), grad (n_ip, ng, 3)

    field_N, field_grad_ref = [], []
    for layout in field_layouts_per_block:
        shapes = vmap(layout.finite_element.interpolant_fn)(quad_xi)
        field_N.append(shapes.N)
        field_grad_ref.append(shapes.grad_N)

    shared = {"quad_w": quad_w, "N": tuple(field_N)}
    h_all = element_rms_edge_sizes(mesh)

    cache: dict[str, dict] = {}
    for name, elems in mesh.element_blocks.items():
        X = jnp.asarray(mesh.nodes[mesh.connectivity[elems]])  # (n_b, ng, 3)
        # iso_jac[e, p, i, j] = dx_i/dxi_j
        iso_jac = jnp.einsum("eai,paj->epij", X, geom.grad_N)
        # closed-form 3x3 det/inv: elementwise-only, so the f64 path
        # compiles on TPU (XLA's LuDecomposition custom call is F32-only)
        det = det3(iso_jac)
        inv = inv3(iso_jac)
        coords_ip = jnp.einsum("pa,eai->epi", geom.N, X)
        grad_N_phys = tuple(
            jnp.einsum("pnj,epji->epni", g_ref, inv)
            for g_ref in field_grad_ref)
        cache[name] = {
            "per_elem": {
                "iso_jac_det": det,
                "coords_ip": coords_ip,
                "grad_N_phys": grad_N_phys,
                "h": jnp.asarray(h_all[elems]),
            },
            "shared": shared,
        }
    return cache


def compute_ip_quadrature_weights(geometry_cache: dict[str, dict]):
    """Per-block ``iso_jac_det * w`` (n_elems, n_ip) — the integration
    measure for IO volume-averaging consumers."""
    import numpy as np
    return {
        name: np.asarray(c["per_elem"]["iso_jac_det"]
                         * c["shared"]["quad_w"][None, :])
        for name, c in geometry_cache.items()}
