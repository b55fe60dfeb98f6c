"""Demonstrate the closed-form symmetric 3x3 eigendecomposition.

Counterpart of the reference ``examples/demo_eigen_solve.py``: compares
the batched closed-form jax solver against numpy's eigh and times a large
batch (the Barlat yield evaluates two of these per Gauss point).

Usage:  python examples/demo_eigen_solve.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from cmad_tpu.util.jax_eigen_decomposition import (
    compute_eigenvalues,
    sorted_eigen_decomposition,
)


def main() -> None:
    rng = np.random.RandomState(0)
    A = rng.normal(size=(3, 3))
    A = 0.5 * (A + A.T)

    eigs, V = sorted_eigen_decomposition(jnp.asarray(A))
    w_np, V_np = np.linalg.eigh(A)
    print("closed-form eigenvalues:", np.asarray(eigs))
    print("numpy eigh eigenvalues: ", w_np)
    print("reconstruction error:",
          np.abs(np.asarray(V) @ np.diag(np.asarray(eigs))
                 @ np.asarray(V).T - A).max())

    batch = 1_000_000
    B = rng.normal(size=(batch, 3, 3))
    B = 0.5 * (B + np.swapaxes(B, -1, -2))
    B_jax = jnp.asarray(B)
    fn = jax.jit(compute_eigenvalues)
    fn(B_jax).block_until_ready()
    t0 = time.perf_counter()
    out = fn(B_jax)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"batched closed form: {batch / dt / 1e6:.1f} M eigensolves/s "
          f"on {jax.default_backend()}")
    ref = np.linalg.eigvalsh(B[:1000])
    ours = np.sort(np.asarray(out[:1000]), axis=-1)
    print("max eigenvalue error vs eigh (1000 samples):",
          np.abs(ours - ref).max())


if __name__ == "__main__":
    main()
