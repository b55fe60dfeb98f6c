"""Calibration-parameter container: values + active flags + transforms.

Parity: reference ``cmad/parameters/parameters.py:176-401``, redesigned
around *vectorized* transform machinery and a fully-traceable
``tree_with_flat_active`` closure so whole objectives can be differentiated
end-to-end on device (the reference applies chain-rule transforms post-hoc
with per-entry Python loops).

A ``Parameters`` holds three parallel pytrees:

- ``values``: nested dict of floats / arrays (the physical parameters)
- ``active_flags``: same structure, bool per leaf (arrays share one flag)
- ``transforms``: same structure; each leaf is ``None`` (identity),
  ``[lo, hi]`` (affine map from canonical [-1, 1]), or ``[ref]``
  (log map: physical = ref * exp(canonical)).
"""
from __future__ import annotations

from itertools import chain
from typing import Any

import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree
from jax.tree_util import tree_flatten, tree_flatten_with_path, tree_map

from cmad_tpu import config
from cmad_tpu.typing import ActiveFlags, JaxArray, Params, PyTree, Transform, Transforms

# transform kind codes used in the vectorized tables
_IDENTITY, _BOUNDS, _LOG = 0, 1, 2


def bounds_transform(value, bounds, transform_from_canonical=True):
    """Affine map between canonical [-1, 1] and [lo, hi]."""
    span = 0.5 * (bounds[1] - bounds[0])
    mean = 0.5 * (bounds[0] + bounds[1])
    if transform_from_canonical:
        return span * value + mean
    return float(np.clip((value - mean) / span, -1.0, 1.0))


def log_transform(value, ref_value, transform_from_canonical=True):
    """Log map: physical = ref * exp(canonical)."""
    if transform_from_canonical:
        return ref_value[0] * jnp.exp(value)
    return float(np.log(value / ref_value[0]))


def _leaf_size(x) -> int:
    if isinstance(x, (float, int, np.floating)):
        return 1
    return int(np.size(x))


def _expand_by_value_size(values: PyTree, tree: PyTree) -> list:
    """Repeat each leaf of ``tree`` once per element of the matching
    ``values`` leaf (array leaves share a single flag/transform)."""
    value_leaves, _ = tree_flatten(values)
    # transform leaves are None / [lo, hi] / [ref]; flag leaves are bools —
    # stop flattening at lists so a [lo, hi] pair stays one leaf
    is_leaf = lambda x: x is None or isinstance(  # noqa: E731
        x, (list, tuple, np.ndarray))
    other_leaves, _ = tree_flatten(tree, is_leaf=is_leaf)
    expanded = [[leaf] * _leaf_size(v)
                for v, leaf in zip(value_leaves, other_leaves, strict=True)]
    return list(chain.from_iterable(expanded))


def _transform_kind(t: Transform) -> int:
    if t is None:
        return _IDENTITY
    if len(t) == 2:
        return _BOUNDS
    if len(t) == 1:
        return _LOG
    raise ValueError(f"unexpected transform shape: {t}")


class Parameters:
    """Pytree parameter container with canonical-space machinery."""

    def __init__(
            self, values: Params,
            active_flags: ActiveFlags | None = None,
            transforms: Transforms | None = None,
    ) -> None:
        dtype = config.real_dtype()
        self.values: Params = tree_map(
            lambda x: jnp.asarray(x, dtype=dtype), values)
        self._active_flags = active_flags
        self._transforms = transforms

        self._flat_values, self.reconstruct_from_flat = \
            ravel_pytree(self.values)
        self.num_params = int(self._flat_values.size)

        flattened, _ = tree_flatten_with_path(self.values)
        self._names = [str(kp[-1]) for kp, _v in flattened]
        sizes = tree_map(_leaf_size, values)
        self.flat_param_sizes, _ = tree_flatten(sizes)

        if active_flags is None:
            assert transforms is None, \
                "active_flags must be supplied when transforms is set"
            self.num_active_params = 0
            self.active_idx = np.zeros(0, dtype=np.intp)
            return

        assert transforms is not None, \
            "transforms must be supplied when active_flags is set"

        flat_flags = np.array(
            _expand_by_value_size(values, active_flags), dtype=bool)
        self._flat_active_flags = flat_flags
        self.active_idx = np.arange(self.num_params)[flat_flags]
        self.num_active_params = int(flat_flags.sum())

        self._flat_transforms: list[Transform] = \
            _expand_by_value_size(values, transforms)
        self._flat_active_transforms = [
            self._flat_transforms[i] for i in self.active_idx]

        # vectorized transform tables over the active entries
        kinds = np.array([_transform_kind(t)
                          for t in self._flat_active_transforms])
        self._active_kinds = kinds
        span = np.ones(self.num_active_params)
        mean = np.zeros(self.num_active_params)
        ref = np.ones(self.num_active_params)
        for i, t in enumerate(self._flat_active_transforms):
            if kinds[i] == _BOUNDS:
                span[i] = 0.5 * (t[1] - t[0])
                mean[i] = 0.5 * (t[1] + t[0])
            elif kinds[i] == _LOG:
                ref[i] = t[0]
        self._span, self._mean, self._ref = span, mean, ref

        # scipy.optimize bounds in canonical space: [-1, 1] for bounds
        # transforms, unbounded otherwise
        self.opt_bounds = np.array([
            [-1.0, 1.0] if k == _BOUNDS else [None, None] for k in kinds],
            dtype=object)

    # ------------------------------------------------------------------
    # traced canonical/physical conversions (vectorized, jax-safe)
    # ------------------------------------------------------------------
    def physical_from_canonical_active(self, a: JaxArray) -> JaxArray:
        """Vector of physical values from canonical active values."""
        a = jnp.asarray(a)
        k = self._active_kinds
        span = jnp.asarray(self._span, dtype=a.dtype)
        mean = jnp.asarray(self._mean, dtype=a.dtype)
        ref = jnp.asarray(self._ref, dtype=a.dtype)
        # double-where: exp() must see only log-transformed entries, or a
        # large physical value in an identity slot overflows in the
        # unselected branch and its reverse-mode cotangent turns 0 * inf
        # into NaN
        a_log = jnp.where(k == _LOG, a, 0.0)
        out = jnp.where(k == _BOUNDS, span * a + mean, a)
        return jnp.where(k == _LOG, ref * jnp.exp(a_log), out)

    def tree_with_flat_active(
            self, a: JaxArray, canonical: bool = False) -> Params:
        """Rebuild the full params pytree with active entries replaced by
        ``a`` (canonical or physical). Fully traceable: differentiating a
        function of this pytree w.r.t. ``a`` gives transformed gradients
        for free."""
        a = jnp.asarray(a, dtype=self._flat_values.dtype)
        if canonical:
            a = self.physical_from_canonical_active(a)
        flat = self._flat_values.at[jnp.asarray(self.active_idx)].set(a)
        return self.reconstruct_from_flat(flat)

    # reference-parity alias (cmad/parameters/parameters.py:384)
    def get_params_pytree_from_flat_canonical_active(self, a) -> Params:
        return self.tree_with_flat_active(a, canonical=True)

    # ------------------------------------------------------------------
    # host-side state management
    # ------------------------------------------------------------------
    def set_rotation_matrix(self, rotation_matrix) -> None:
        self.values["rotation matrix"] = jnp.asarray(
            rotation_matrix, dtype=config.real_dtype())
        self._flat_values, _ = ravel_pytree(self.values)

    def set_active_values_from_flat(
            self, flat_active_values, are_canonical: bool = True) -> None:
        a = np.asarray(flat_active_values)
        if are_canonical:
            a = np.asarray(self.physical_from_canonical_active(a))
        flat = np.array(self._flat_values)
        flat[self.active_idx] = a
        self.values = self.reconstruct_from_flat(jnp.asarray(flat))
        self._flat_values, _ = ravel_pytree(self.values)

    def flat_active_values(self, return_canonical: bool = False) -> np.ndarray:
        flat, _ = ravel_pytree(self.values)
        active = np.asarray(flat)[self.active_idx]
        if not return_canonical:
            return active
        out = np.empty_like(active)
        for i, (v, t) in enumerate(
                zip(active, self._flat_active_transforms, strict=True)):
            k = _transform_kind(t)
            if k == _BOUNDS:
                out[i] = bounds_transform(v, t, transform_from_canonical=False)
            elif k == _LOG:
                out[i] = log_transform(v, t, transform_from_canonical=False)
            else:
                out[i] = v
        return out

    def get_active_from_flat(self, pytree: PyTree) -> np.ndarray:
        flat, _ = ravel_pytree(pytree)
        return np.asarray(flat)[self.active_idx]

    # ------------------------------------------------------------------
    # post-hoc chain-rule transforms (vectorized; parity with reference
    # transform_grad / transform_hessian at parameters.py:326,334)
    # ------------------------------------------------------------------
    def _deriv_factors(self) -> tuple[np.ndarray, np.ndarray]:
        """(first, second) canonical-derivative factors at the current
        active physical values: d(phys)/d(canon) and d2(phys)/d(canon)2."""
        v = self.flat_active_values()
        k = self._active_kinds
        first = np.where(k == _BOUNDS, self._span,
                         np.where(k == _LOG, v, 1.0))
        second = np.where(k == _LOG, v, 0.0)
        return first, second

    def transform_grad(self, grad: np.ndarray) -> np.ndarray:
        """Physical-space gradient -> canonical-space gradient."""
        first, _ = self._deriv_factors()
        return np.asarray(grad) * first

    def transform_hessian(
            self, hessian: np.ndarray, grad: np.ndarray) -> np.ndarray:
        """Physical-space (H, g) -> canonical-space Hessian."""
        first, second = self._deriv_factors()
        H = np.asarray(hessian) * np.outer(first, first)
        return H + np.diag(np.asarray(grad) * second)

    # ------------------------------------------------------------------
    # jacobian-pytree helpers for model/qoi derivative surfaces
    # ------------------------------------------------------------------
    def active_params_jacobian(
            self, jac_pytree: PyTree, num_rows: int) -> JaxArray:
        """Flatten a jacobian-w.r.t.-params pytree (as returned by
        jax.jacrev over the params dict) to a dense (num_rows, n_active)
        matrix. Parity: parameters.py:384 _active_params_jacobian."""
        reshaped = tree_map(lambda x: x.reshape(num_rows, -1), jac_pytree)
        leaves, _ = tree_flatten(reshaped)
        full = jnp.concatenate(leaves, axis=1)
        return full[:, jnp.asarray(self.active_idx)]

    def scalar_active_params_jacobian(self, jac_pytree: PyTree) -> JaxArray:
        return self.active_params_jacobian(jac_pytree, 1)
