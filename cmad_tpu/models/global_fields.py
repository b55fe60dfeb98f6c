"""Global-field context passed into model evaluation.

Parity: reference ``cmad/models/global_fields.py:14,34``. Implemented as a
plain dict-of-dicts pytree (``{"fields": ..., "grad_fields": ...}``) wrapped
in a tiny frozen dataclass registered as a pytree node, so it threads through
jit/vmap/scan with zero overhead.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from cmad_tpu.typing import JaxArray


@register_pytree_node_class
@dataclass(frozen=True)
class GlobalFieldsAtPoint:
    """Interpolated global fields and gradients at one evaluation point.

    For batched evaluation the leaves simply carry leading batch dims
    (``fields["u"]: (..., d)``, ``grad_fields["u"]: (..., d, d)``).
    """

    fields: dict[str, JaxArray]
    grad_fields: dict[str, JaxArray]

    def tree_flatten(self):
        return (self.fields, self.grad_fields), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(fields=children[0], grad_fields=children[1])


def mp_U_from_F(F) -> GlobalFieldsAtPoint:
    """Material-point U from a prescribed deformation gradient.

    ``grad u = F - I``; batch dims allowed on F (``(..., d, d)``).
    Parity: reference ``cmad/models/global_fields.py:34``.
    """
    F = jnp.asarray(F)
    ndims = F.shape[-1]
    batch = F.shape[:-2]
    return GlobalFieldsAtPoint(
        fields={"u": jnp.zeros((*batch, ndims), dtype=F.dtype)},
        grad_fields={"u": F - jnp.eye(ndims, dtype=F.dtype)},
    )
