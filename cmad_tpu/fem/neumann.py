"""Neumann (surface-flux) BC resolution and assembly.

Parity: reference ``cmad/fem/neumann.py``. NBCs resolve at build time to
per-(family, local_side) element groups; surface geometry (side-IP area
measure via the ref-side lift, physical IP coords), side-restricted shape
values, and scatter indices are precomputed into dict pytrees; per-call
assembly is a vmap + scatter adding ``-N . tbar . dA . w`` into R.
"""
from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np
from jax import vmap

from cmad_tpu.fem.bcs import NeumannBC
from cmad_tpu.fem.dof import GlobalDofMap
from cmad_tpu.fem.elements import EntityType, FiniteElement
from cmad_tpu.fem.mesh import Mesh
from cmad_tpu.fem.quadrature import QuadratureRule
from cmad_tpu.fem.topology import ElementFamily, ref_side_lift
from cmad_tpu.typing import JaxArray, Scalar

# Per-NBC tuple of dicts keyed by (family, local_side_id); each value is
# {"dA": (n_e, n_ip), "coords_ip": (n_e, n_ip, 3),
#  "eq_flat": (n_e, nbf * ncomp), "N_side": (n_ip, n_side_bf),
#  "side_w": (n_ip,)}.
NeumannSideArrays = tuple


@dataclass(frozen=True)
class ResolvedNeumannBC:
    field_idx: int
    num_components: int
    finite_element: FiniteElement
    elem_ids_by_side: dict[tuple[ElementFamily, int], np.ndarray]
    values: np.ndarray | Callable


def resolve_neumann_bcs(mesh: Mesh, dof_map: GlobalDofMap,
                        neumann_bcs: Sequence[NeumannBC]
                        ) -> list[ResolvedNeumannBC]:
    name_to_idx = {fl.name: i for i, fl in enumerate(dof_map.field_layouts)}
    out: list[ResolvedNeumannBC] = []
    for k, bc in enumerate(neumann_bcs):
        if bc.field_name not in name_to_idx:
            raise ValueError(
                f"NeumannBC[{k}] field {bc.field_name!r} unknown; fields: "
                f"{sorted(name_to_idx)}")
        fi = name_to_idx[bc.field_name]
        fe = dof_map.field_layouts[fi].finite_element
        if not fe.vertex_only() or fe.dofs_per_entity.get(
                EntityType.VERTEX, 0) != 1:
            raise NotImplementedError(
                f"NeumannBC[{k}]: side resolution requires 1 VERTEX DOF "
                f"per basis fn (FE {fe.name!r})")
        ncomp = int(dof_map.num_dofs_per_basis_fn[fi])

        groups: dict[tuple[ElementFamily, int], list[int]] = {}
        for ss in bc.sideset_names:
            if ss not in mesh.side_sets:
                raise ValueError(
                    f"NeumannBC[{k}] sideset {ss!r} unknown; known: "
                    f"{sorted(mesh.side_sets)}")
            for elem_id, side_id in mesh.side_sets[ss]:
                groups.setdefault(
                    (mesh.element_family, int(side_id)), []).append(
                        int(elem_id))
        elem_ids = {key: np.unique(np.asarray(v, dtype=np.intp))
                    for key, v in groups.items()}

        if callable(bc.values):
            values = bc.values
        else:
            values = np.asarray(bc.values, dtype=np.float64)
            if values.shape != (ncomp,):
                raise ValueError(
                    f"NeumannBC[{k}] values shape {values.shape} != "
                    f"({ncomp},) for field {bc.field_name!r}")
        out.append(ResolvedNeumannBC(
            field_idx=fi, num_components=ncomp, finite_element=fe,
            elem_ids_by_side=elem_ids, values=values))
    return out


def build_neumann_side_arrays(
        mesh: Mesh, dof_map: GlobalDofMap,
        resolved: Sequence[ResolvedNeumannBC],
        side_quadrature: dict[ElementFamily, QuadratureRule]
) -> NeumannSideArrays:
    """Precompute per-side-group surface geometry + scatter indices."""
    if not resolved:
        return ()
    geom_fn = mesh.geometric_finite_element.interpolant_fn

    per_nbc = []
    for nbc in resolved:
        fe = nbc.finite_element
        ncomp = nbc.num_components
        offset = int(dof_map.block_offsets[nbc.field_idx])
        karr = np.arange(ncomp)
        groups = {}
        for (family, side_id), elem_ids in nbc.elem_ids_by_side.items():
            sq = side_quadrature[family]
            origin, tangents = ref_side_lift(family, side_id)
            xi_vol = jnp.asarray(origin[None, :] + sq.xi @ tangents.T)
            geom = vmap(geom_fn)(xi_vol)
            field = vmap(fe.interpolant_fn)(xi_vol)
            N_side = field.N[:, fe.side_basis_fns(side_id)]

            conn = mesh.connectivity[elem_ids].astype(np.intp)
            X = jnp.asarray(mesh.nodes[conn])
            iso_jac = jnp.einsum("eai,paj->epij", X, geom.grad_N)
            surf = jnp.einsum("epij,jm->epim", iso_jac,
                              jnp.asarray(tangents))
            dA = jnp.linalg.norm(
                jnp.cross(surf[..., 0], surf[..., 1]), axis=-1)
            coords_ip = jnp.einsum("pa,eai->epi", geom.N, X)

            eq = (offset + conn[:, :, None] * ncomp
                  + karr[None, None, :]).reshape(conn.shape[0], -1)
            groups[(family, side_id)] = {
                "dA": dA, "coords_ip": coords_ip,
                "eq_flat": jnp.asarray(eq),
                "N_side": N_side, "side_w": jnp.asarray(sq.w)}
        per_nbc.append(groups)
    return tuple(per_nbc)


def _as_values_fn(values) -> Callable:
    if callable(values):
        return values
    const = jnp.asarray(values)

    def constant(coords, t):
        return jnp.broadcast_to(const, (coords.shape[0], *const.shape))

    return constant


def assemble_side_neumann(dof_map: GlobalDofMap,
                          neumann_side_arrays: NeumannSideArrays,
                          resolved: Sequence[ResolvedNeumannBC],
                          t: Scalar) -> JaxArray:
    """Surface-flux contribution to R (sign: R -= integral N . tbar dA);
    K gets nothing (explicit tractions are U-independent)."""
    from cmad_tpu import config

    n_dofs = dof_map.num_total_dofs
    R = jnp.zeros(n_dofs, dtype=config.real_dtype())
    if not resolved:
        return R

    for nbc, groups in zip(resolved, neumann_side_arrays, strict=True):
        fe = nbc.finite_element
        nbf = fe.num_dofs_per_element
        ncomp = nbc.num_components
        values_fn = _as_values_fn(nbc.values)

        for (_family, side_id), g in groups.items():
            side_bf = jnp.asarray(fe.side_basis_fns(side_id))

            def per_elem(dA_e, coords_e, N_side=g["N_side"],
                         side_w=g["side_w"], side_bf=side_bf):
                def per_ip(N_ip, w_ip, dA_ip, coords_ip):
                    tbar = jnp.asarray(values_fn(coords_ip[None, :], t))[0]
                    return jnp.einsum("a,c->ac", N_ip, tbar) * dA_ip * w_ip

                total = vmap(per_ip)(N_side, side_w, dA_e,
                                     coords_e).sum(axis=0)
                out = jnp.zeros((nbf, ncomp), dtype=total.dtype)
                return out.at[side_bf].add(-total)

            R_pe = vmap(per_elem)(g["dA"], g["coords_ip"])
            R = R.at[g["eq_flat"].ravel()].add(
                R_pe.reshape(R_pe.shape[0], -1).ravel())
    return R
