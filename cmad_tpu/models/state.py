"""Flat local-state layout.

cmad_tpu's TPU-first replacement for the reference's list-of-blocks state
(``cmad/models/model.py:388-420`` xi bookkeeping): the local state at a
material point is ONE flat vector ``xi`` of length ``num_dofs``, and a
:class:`StateLayout` names the slices. Structure-of-arrays batching over
Gauss points is then just a leading batch dimension ``(n_points, num_dofs)``
in HBM — no ravel/unravel in any hot loop.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from cmad_tpu import config
from cmad_tpu.models.var_types import VarType
from cmad_tpu.typing import JaxArray


@dataclass(frozen=True)
class StateBlock:
    """One named variable inside the flat state vector."""

    var_name: str
    resid_name: str
    var_type: VarType
    size: int
    init: tuple[float, ...]  # initial values, length == size

    @staticmethod
    def zeros(var_name: str, resid_name: str, var_type: VarType,
              size: int) -> "StateBlock":
        return StateBlock(var_name, resid_name, var_type, size,
                          (0.0,) * size)

    @staticmethod
    def ones(var_name: str, resid_name: str, var_type: VarType,
             size: int) -> "StateBlock":
        return StateBlock(var_name, resid_name, var_type, size,
                          (1.0,) * size)


class StateLayout:
    """Immutable map from variable names to slices of the flat state."""

    def __init__(self, blocks: tuple[StateBlock, ...] | list[StateBlock]):
        self.blocks = tuple(blocks)
        offsets = np.cumsum([0] + [b.size for b in self.blocks])
        self.offsets = offsets[:-1]
        self.num_dofs = int(offsets[-1])
        self._slices = {
            b.var_name: slice(int(o), int(o + b.size))
            for b, o in zip(self.blocks, self.offsets, strict=True)
        }

    def __len__(self) -> int:
        return len(self.blocks)

    def slc(self, var_name: str) -> slice:
        return self._slices[var_name]

    def get(self, xi: JaxArray, var_name: str) -> JaxArray:
        """Batched slice: works on (num_dofs,) or (..., num_dofs)."""
        return xi[..., self._slices[var_name]]

    def init_xi(self, dtype=None) -> JaxArray:
        dtype = dtype or config.real_dtype()
        vals = [v for b in self.blocks for v in b.init]
        return jnp.asarray(vals, dtype=dtype)

    @property
    def var_names(self) -> list[str]:
        return [b.var_name for b in self.blocks]

    @property
    def resid_names(self) -> list[str]:
        return [b.resid_name for b in self.blocks]

    @property
    def var_types(self) -> list[VarType]:
        return [b.var_type for b in self.blocks]

    @property
    def sizes(self) -> list[int]:
        return [b.size for b in self.blocks]
