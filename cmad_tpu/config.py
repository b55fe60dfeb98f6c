"""Precision / platform policy for cmad_tpu.

The reference framework (cmad) forces ``jax_enable_x64 = True`` globally
(``/root/reference/cmad/__init__.py:5-7``) because its Newton tolerances are
1e-12..1e-14. TPUs have no native float64, so cmad_tpu uses a *policy*:

- ``CMAD_X64=1`` (or ``auto`` on CPU hosts): enable x64. All solves run in
  float64 and match the reference tolerances bit-for-tolerance. This is the
  verification configuration used by the test suite.
- ``CMAD_X64=0`` (or ``auto`` on TPU hosts): stay in float32. Solver
  tolerances returned by :func:`newton_tols` are loosened to ~1e-6 (abs) /
  1e-6 (rel), which is what a well-scaled f32 Newton can reach. All residuals
  in cmad_tpu are nondimensionalized by ``2*mu`` (as in the reference), so
  f32 convergence is well-conditioned.

Nothing else in the package branches on platform: the same traced code runs
on CPU f64 and TPU f32.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_X64_ENV = "CMAD_X64"


def _decide_x64() -> bool:
    mode = os.environ.get(_X64_ENV, "auto").lower()
    if mode in ("1", "true", "on", "yes"):
        return True
    if mode in ("0", "false", "off", "no"):
        return False
    # auto: enable on CPU-only hosts; disable when an accelerator is present.
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover - backend init failure
        platform = "cpu"
    return platform == "cpu"


_X64_ENABLED: bool | None = None


def setup() -> None:
    """Apply the precision policy once, at package import."""
    global _X64_ENABLED
    if _X64_ENABLED is not None:
        return
    _X64_ENABLED = _decide_x64()
    jax.config.update("jax_enable_x64", _X64_ENABLED)
    # TPU f32 matmuls/einsums default to bfloat16 MXU passes (~1e-3
    # relative error) — fine for NN training, fatal for an implicit FE
    # code: the global Newton stagnates ~1000x above the f32 floor
    # because the assembled Jacobian no longer matches the residual.
    # Force true-f32 matmul accumulation (no-op on CPU f64).
    jax.config.update("jax_default_matmul_precision", "highest")
    # Persistent XLA compilation cache, OPT-IN via CMAD_XLA_CACHE=<dir>.
    # Off by default: XLA:CPU AOT entries embed the compiling machine's
    # feature flags, and loading them from a differently-configured
    # process emits "could lead to execution errors such as SIGILL"
    # (measured r2 when one cache dir was shared across environments);
    # the remote-TPU backend gained nothing from it either.
    cache = os.environ.get("CMAD_XLA_CACHE", "")
    if cache and cache not in ("0", "off", "false"):
        try:
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:  # pragma: no cover - cache is best-effort
            pass


def x64_enabled() -> bool:
    if _X64_ENABLED is None:
        setup()
    return bool(jax.config.read("jax_enable_x64"))


def real_dtype() -> jnp.dtype:
    """The working real dtype for all state/parameter arrays."""
    return jnp.float64 if x64_enabled() else jnp.float32


def newton_tols(kind: str = "mp_local") -> tuple[float, float]:
    """(abs_tol, rel_tol) per solver family, dtype-aware.

    f64 values match the reference defaults:
      mp_local  1e-14 (models/nonlinear_solver.py:17-18)
      fe_local  1e-12 (global_residuals/global_residual.py:292-297)
      fe_global 1e-10 (fem/nonlinear_solver.py:30-36)
    """
    if x64_enabled():
        table = {
            "mp_local": (1e-14, 1e-14),
            "fe_local": (1e-12, 1e-12),
            "fe_global": (1e-10, 1e-10),
        }
    else:
        table = {
            "mp_local": (1e-6, 1e-6),
            "fe_local": (1e-5, 1e-5),
            # with true-f32 matmul precision (see setup) the global
            # Newton reaches ~1e-5 relative; abs 1e-6 is the f32 floor
            # guard for tiny problems
            "fe_global": (1e-6, 1e-5),
        }
    return table[kind]


def clamp_newton_tols(abs_tol: float, rel_tol: float,
                      kind: str) -> tuple[float, float]:
    """Clamp deck-specified Newton tolerances to the dtype floor.

    Decks are written against the reference's f64 tolerances (1e-12..
    1e-14). Under the f32 policy those are unreachable: the local
    Newton would spin to its iteration cap with the line search
    shrinking steps into rounding noise (observed to both slow down and
    corrupt f32 notch runs). The same deck must run on both platforms,
    so tolerances tighter than the f32 floor are raised to it.
    """
    if x64_enabled():
        return abs_tol, rel_tol
    floor_abs, floor_rel = newton_tols(kind)
    return max(abs_tol, floor_abs), max(rel_tol, floor_rel)
