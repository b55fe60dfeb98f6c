"""Two-level (aggregation + rigid-body coarse space) preconditioner.

The device-native replacement for the reference's pyamg smoothed-
aggregation arm (SURVEY.md section 2 native-equivalent item (b), and
the fix for Jacobi-CG's 1/h iteration growth at scale):

- **Setup (host, static, once per problem):** nodes are binned into
  coordinate aggregates; each aggregate carries the 6 rigid-body modes
  centered at its centroid (the near-null space of 3D elasticity — the
  low-energy modes one-level smoothers cannot damp), plus a constant-
  pressure mode for the mixed u-p layout. Prescribed Dirichlet rows are
  zeroed. The result is the tentative prolongator P with a fixed
  w-wide block per dof row (w = 6 or 7), stored as
  ``(P_vals (n_dofs, w), agg_of_dof (n_dofs,))`` — no ragged
  structure, so every traced apply is a gather + elementwise op.
- **Per-solve (traced):** the coarse operator A_c = P^T K P is
  contracted straight from K's deduped COO (one w*w-term outer product
  per nonzero, scatter-added into the dense (m, m) coarse matrix),
  diagonally equilibrated with near-null columns deflated, then
  factored once (Cholesky for SPD/CG, LU for saddle points/GMRES);
  each application is ``z = D^-1 r + P A_c^-1 P^T r`` (additive
  smoother + coarse correction).

Validated envelope: displacement CG (SPD) at any tested scale; mixed
u-p GMRES on elastic AND plastic tangents — with the symmetric
diagonal equilibration applied by solve_linear and the per-node 4x4
block smoother (below), the 5-step mixed plastic cube in f32 agrees
with f64 direct truth to 6 digits on CPU and 7 on TPU (measured r2).

Everything is XLA-friendly: gathers, segment sums, one small dense
factorization — no host callbacks.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import register_pytree_node_class

from cmad_tpu.typing import JaxArray

# the coarse operator is materialized dense (m, m) and LU-factorized;
# past this ceiling the setup cost/footprint stops being "free" next to
# the fine-level work (24k^2 f64 = 4.6 GB transient). Pattern builders
# auto-coarsen the aggregation to stay under it; coarse_matrix raises
# as the backstop for hand-built patterns.
DENSE_COARSE_CEILING = 24000

# materialize the coarse inverse (apply = one matmul instead of TPU
# latency-bound triangular solves) up to this coarse dimension
_EXPLICIT_INVERSE_CEILING = 4096

_NULL_COL_REL = 1e-8   # relative diagonal floor below which a coarse
                       # column is deflated (dropped) instead of scaled


@register_pytree_node_class
@dataclass(frozen=True)
class TwoLevelPattern:
    """Static carrier for the tentative prolongator.

    ``P_vals`` has a fixed per-row width w: 6 for the displacement-only
    layout (rigid-body slots), 7 for mixed u-p (slots 0-5 RBMs on u
    rows, slot 6 the constant-pressure mode on p rows; unused slots are
    zero, so the uniform width costs only harmless zero scatter-adds).
    """

    P_vals: JaxArray       # (n_dofs, w)
    agg_of_dof: JaxArray   # (n_dofs,) int32
    num_aggregates: int
    # optional sorted-contraction plan for coarse_matrix (attached by
    # attach_coarse_scatter once the fine sparsity is known): fine nnz
    # sorted by coarse (aggI, aggJ) pair so the P^T K P contraction is
    # a SORTED segment-sum + a tiny n_pairs*w*w scatter instead of a
    # random nnz*w*w scatter-add (3x on TPU, where random scatter is
    # latency-bound; measured r3, h=0.03 notch: 63 -> 20 ms per build)
    coarse_order: np.ndarray | None = None   # (nnz,) int32
    coarse_seg: np.ndarray | None = None     # (nnz,) int32, sorted
    coarse_pI: np.ndarray | None = None      # (n_pairs,) int32
    coarse_pJ: np.ndarray | None = None      # (n_pairs,) int32

    @property
    def width(self) -> int:
        return int(self.P_vals.shape[1])

    @property
    def coarse_dim(self) -> int:
        return self.width * self.num_aggregates

    def tree_flatten(self):
        return (self.P_vals, self.agg_of_dof, self.coarse_order,
                self.coarse_seg, self.coarse_pI,
                self.coarse_pJ), self.num_aggregates

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux, *children[2:])


def build_two_level_pattern(coords: np.ndarray,
                            prescribed_indices: np.ndarray,
                            n_dofs: int,
                            target_nodes_per_aggregate: int = 48,
                            dtype=np.float64) -> TwoLevelPattern:
    """Aggregate nodes by coordinate binning and attach centered
    rigid-body blocks.

    Supports the interleaved single-displacement-field layout
    (``dof = 3 * node + component``); callers must check
    ``n_dofs == 3 * coords.shape[0]``.
    """
    n_nodes = coords.shape[0]
    if n_dofs != 3 * n_nodes:
        raise ValueError(
            "two-level preconditioner supports the single displacement "
            f"field layout (3 dofs/node); got n_dofs={n_dofs} for "
            f"{n_nodes} nodes")

    agg_of_node, n_aggs = _aggregate_nodes_capped(
        coords, target_nodes_per_aggregate, width=6)
    B = _centered_rbm_blocks(coords, agg_of_node, n_aggs, dtype)

    P_vals = B.reshape(n_nodes * 3, 6)
    agg_of_dof = np.repeat(agg_of_node, 3).astype(np.int32)
    _normalize_and_mask(P_vals, agg_of_dof, n_aggs, prescribed_indices)
    # keep the carrier as NUMPY: the pattern is built lazily, possibly
    # inside a jit trace (the solver dispatch), and jnp constants
    # created there would leak tracers into the cross-trace cache
    return TwoLevelPattern(P_vals, agg_of_dof, n_aggs)


def build_two_level_pattern_mixed(coords: np.ndarray,
                                  prescribed_indices: np.ndarray,
                                  n_dofs: int,
                                  target_nodes_per_aggregate: int = 48,
                                  dtype=np.float64) -> TwoLevelPattern:
    """Mixed u-p layout: width-7 rows — u dofs (block 0, 3/node) carry
    centered rigid-body slots 0-5; p dofs (block 1, 1/node, offset 3n)
    carry the constant-pressure mode in slot 6 (the near-null spaces of
    the saddle point's diagonal blocks)."""
    n_nodes = coords.shape[0]
    if n_dofs != 4 * n_nodes:
        raise ValueError(
            "mixed two-level pattern expects the u (3/node) + p (1/node)"
            f" equal-order layout; got n_dofs={n_dofs} for {n_nodes} "
            "nodes")

    agg_of_node, n_aggs = _aggregate_nodes_capped(
        coords, target_nodes_per_aggregate, width=7)
    B = _centered_rbm_blocks(coords, agg_of_node, n_aggs, dtype)

    P_vals = np.zeros((n_dofs, 7), dtype=dtype)
    P_vals[:3 * n_nodes, :6] = B.reshape(n_nodes * 3, 6)
    P_vals[3 * n_nodes:, 6] = 1.0
    agg_of_dof = np.concatenate([
        np.repeat(agg_of_node, 3), agg_of_node]).astype(np.int32)
    _normalize_and_mask(P_vals, agg_of_dof, n_aggs, prescribed_indices)
    return TwoLevelPattern(P_vals, agg_of_dof, n_aggs)


def _aggregate_nodes_capped(coords: np.ndarray, target: int, width: int):
    """Aggregate, auto-coarsening so the dense coarse space fits
    :data:`DENSE_COARSE_CEILING`: a 1M-node mesh at the default 48
    nodes/aggregate would ask for a 125k-dof dense coarse factorization
    (60+ GB). Bumping nodes/aggregate keeps the preconditioner working
    (iteration counts degrade gracefully with aggregate size) instead of
    failing; a warning records the effective value. The retry loop is
    needed because the box binning only lands near its requested count
    (axis rounding can overshoot by ~25%)."""
    import warnings

    max_aggs = max(1, DENSE_COARSE_CEILING // width)
    agg_of_node, n_aggs = _aggregate_nodes(coords, target)
    if n_aggs <= max_aggs:
        return agg_of_node, n_aggs
    fitted = target
    while n_aggs > max_aggs:
        fitted = max(fitted + 1, int(fitted * n_aggs / max_aggs * 1.1))
        agg_of_node, n_aggs = _aggregate_nodes(coords, fitted)
    warnings.warn(
        f"two-level: {coords.shape[0]} nodes at {target} "
        f"nodes/aggregate would overflow the {DENSE_COARSE_CEILING}-dof "
        f"dense coarse ceiling; using {fitted} nodes/aggregate "
        f"({n_aggs * width} coarse dofs) — set 'aggregate nodes' "
        "explicitly to tune", stacklevel=3)
    return agg_of_node, n_aggs


def _aggregate_nodes(coords: np.ndarray, target: int):
    """Regular bounding-box binning -> (agg_of_node, n_aggs).

    Axes whose span is negligible relative to the largest (near-planar /
    near-linear meshes) get a single bin: normalizing by a ~0 span would
    blow the per-axis division counts up by ~1e10, overflow the flat bin
    id, and silently merge far-apart nodes into one aggregate.
    """
    n_nodes = coords.shape[0]
    n_aggs_target = max(1, n_nodes // target)
    lo, hi = coords.min(axis=0), coords.max(axis=0)
    span = hi - lo
    max_span = max(span.max(), 1e-30)
    active = span > 1e-9 * max_span
    n_active = int(active.sum())
    divs = np.ones(3, dtype=int)
    if n_active:
        rel = np.where(active, span / max_span, 0.0)
        geo = rel[active].prod() ** (1.0 / n_active)
        base = (n_aggs_target ** (1.0 / n_active)) / geo
        divs[active] = np.maximum(1, np.round(rel[active] * base))
        # cap the product near the target so degenerate aspect ratios
        # cannot explode the bin count
        while divs.prod() > 8 * n_aggs_target:
            divs[np.argmax(divs)] = max(1, divs.max() // 2)
    safe_span = np.where(active, span, 1.0)
    bins = [np.clip(((coords[:, k] - lo[k]) / safe_span[k]
                     * divs[k]).astype(np.int64), 0, divs[k] - 1)
            for k in range(3)]
    raw_id = (bins[0] * divs[1] + bins[1]) * divs[2] + bins[2]
    _, agg_of_node = np.unique(raw_id, return_inverse=True)
    return agg_of_node, int(agg_of_node.max()) + 1


def _centered_rbm_blocks(coords, agg_of_node, n_aggs, dtype):
    """B[node, comp, mode]: translations + rotations e_k x r about the
    aggregate centroid."""
    n_nodes = coords.shape[0]
    centroids = np.zeros((n_aggs, 3))
    counts = np.bincount(agg_of_node, minlength=n_aggs).astype(float)
    for k in range(3):
        centroids[:, k] = (np.bincount(agg_of_node, coords[:, k],
                                       minlength=n_aggs) / counts)
    r = coords - centroids[agg_of_node]

    B = np.zeros((n_nodes, 3, 6), dtype=dtype)
    for k in range(3):
        B[:, k, k] = 1.0
    x, y, z = r[:, 0], r[:, 1], r[:, 2]
    B[:, 1, 3], B[:, 2, 3] = -z, y
    B[:, 0, 4], B[:, 2, 4] = z, -x
    B[:, 0, 5], B[:, 1, 5] = -y, x
    return B


def _normalize_and_mask(P_vals, agg_of_dof, n_aggs, prescribed_indices):
    """Per-aggregate column normalization (A_c scaling; rank-deficient
    aggregate slots are handled by the traced null-column deflation in
    make_two_level_preconditioner) + zero prescribed rows so the coarse
    space respects the embedded BCs. In-place; vectorized (one
    np.add.at sweep instead of an O(n_aggs * n_dofs) python loop)."""
    sq = np.zeros((n_aggs, P_vals.shape[1]), dtype=P_vals.dtype)
    np.add.at(sq, agg_of_dof, P_vals**2)
    norms = np.sqrt(sq)
    P_vals /= np.where(norms > 1e-12, norms, 1.0)[agg_of_dof]
    P_vals[np.asarray(prescribed_indices, dtype=np.intp)] = 0.0


def _apply_P(pattern: TwoLevelPattern, x_c: JaxArray,
             P_vals: JaxArray | None = None) -> JaxArray:
    """(m,) coarse -> (n_dofs,) fine."""
    if P_vals is None:
        P_vals = jnp.asarray(pattern.P_vals, dtype=x_c.dtype)
    blocks = x_c.reshape(pattern.num_aggregates,
                         pattern.width)[pattern.agg_of_dof]
    return jnp.sum(P_vals * blocks, axis=-1)


def _apply_PT(pattern: TwoLevelPattern, r: JaxArray,
              P_vals: JaxArray | None = None) -> JaxArray:
    """(n_dofs,) fine -> (m,) coarse."""
    if P_vals is None:
        P_vals = jnp.asarray(pattern.P_vals, dtype=r.dtype)
    contrib = P_vals * r[:, None]                # (n_dofs, w)
    out = jnp.zeros((pattern.num_aggregates, pattern.width),
                    dtype=r.dtype)
    out = out.at[pattern.agg_of_dof].add(contrib)
    return out.reshape(-1)


def attach_coarse_scatter(pattern: TwoLevelPattern,
                          indptr: np.ndarray,
                          col_indices: np.ndarray) -> TwoLevelPattern:
    """Return the pattern with the sorted P^T K P contraction plan for
    the given fine CSR: fine nnz ordered by coarse (aggI, aggJ) pair,
    the sorted segment ids, and the coarse pair list. Host/numpy only
    (the plan embeds as constants in later traces, like the rest of
    the pattern)."""
    import dataclasses

    indptr = np.asarray(indptr)
    cols = np.asarray(col_indices)
    nnz = cols.shape[0]
    rows = np.repeat(np.arange(indptr.shape[0] - 1, dtype=np.int64),
                     np.diff(indptr))
    aggd = np.asarray(pattern.agg_of_dof).astype(np.int64)
    n_aggs = pattern.num_aggregates
    key = aggd[rows] * n_aggs + aggd[cols]
    order = np.argsort(key, kind="stable")
    skey = key[order]
    new = np.empty(nnz, dtype=bool)
    new[0] = True
    new[1:] = skey[1:] != skey[:-1]
    seg = (np.cumsum(new) - 1).astype(np.int32)
    pairs = skey[new]
    return dataclasses.replace(
        pattern,
        coarse_order=order.astype(np.int32),
        coarse_seg=seg,
        coarse_pI=(pairs // n_aggs).astype(np.int32),
        coarse_pJ=(pairs % n_aggs).astype(np.int32))


def coarse_matrix(pattern: TwoLevelPattern, unique: JaxArray,
                  rows: JaxArray, cols: JaxArray,
                  P_vals: JaxArray | None = None) -> JaxArray:
    """A_c = P^T K P from K's deduped COO triplet, dense (m, m).

    With a sorted-contraction plan attached (attach_coarse_scatter),
    the per-nonzero w*w outer products are reordered by coarse pair and
    reduced with a SORTED segment-sum, then scattered once at
    n_pairs*w*w size; without it, falls back to the random nnz*w*w
    scatter-add (identical values — the sorted reduction adds in the
    same pair-local order)."""
    m, w = pattern.coarse_dim, pattern.width
    if m > DENSE_COARSE_CEILING:
        raise ValueError(
            f"two-level coarse space has {m} dofs — the dense (m, m) "
            "coarse factorization would need "
            f"{m * m * 8 / 1e9:.1f} GB; raise 'aggregate nodes' in the "
            "preconditioner spec to shrink the coarse space")
    if P_vals is None:
        P_vals = jnp.asarray(pattern.P_vals, dtype=unique.dtype)
    Pi = P_vals[rows]                            # (nnz, w)
    Pj = P_vals[cols]                            # (nnz, w)
    block = unique[:, None, None] * Pi[:, :, None] * Pj[:, None, :]
    k = jnp.arange(w, dtype=jnp.int32)

    if pattern.coarse_order is not None:
        n_pairs = pattern.coarse_pI.shape[0]
        S = jax.ops.segment_sum(
            block[jnp.asarray(pattern.coarse_order)],
            jnp.asarray(pattern.coarse_seg), num_segments=n_pairs,
            indices_are_sorted=True)
        rows_c = (w * jnp.asarray(pattern.coarse_pI))[:, None, None] \
            + k[None, :, None]
        cols_c = (w * jnp.asarray(pattern.coarse_pJ))[:, None, None] \
            + k[None, None, :]
        A_c = jnp.zeros((m, m), dtype=unique.dtype)
        return A_c.at[jnp.broadcast_to(rows_c, S.shape).reshape(-1),
                      jnp.broadcast_to(cols_c, S.shape).reshape(-1)
                      ].add(S.reshape(-1))

    agg = jnp.asarray(pattern.agg_of_dof)
    ai = agg[rows].astype(jnp.int32)
    aj = agg[cols].astype(jnp.int32)
    rows_c = (w * ai)[:, None, None] + k[None, :, None]
    cols_c = (w * aj)[:, None, None] + k[None, None, :]
    # scatter with 2-D indices: the flattened rows_c * m + cols_c form
    # overflows int32 once m exceeds ~46k coarse dofs
    shape = block.shape
    ri = jnp.broadcast_to(rows_c, shape).reshape(-1)
    ci = jnp.broadcast_to(cols_c, shape).reshape(-1)
    A_c = jnp.zeros((m, m), dtype=unique.dtype)
    return A_c.at[ri, ci].add(block.reshape(-1))


def _node_block_smoother(pattern: TwoLevelPattern, unique: JaxArray,
                         rows: JaxArray, cols: JaxArray):
    """Per-node block-Jacobi smoother for the mixed u-p layout.

    Extracts the 4x4 node blocks (3 u components + the node's p dof,
    including the u-p coupling the scalar |diag| smoother ignores) from
    the deduped COO in one masked scatter, inverts them once with the
    unrolled Gauss-Jordan (``ops.linalg.small_solve`` — batched
    ``jnp.linalg.inv`` lowers to the pathologically slow TPU
    LuDecomposition custom call), and applies them as a gather +
    batched 4x4 matvec. Saddle-point tangents couple u and p most
    strongly within a node, so this is the natural strengthening of
    the smoother the round-1 two-level arm lacked on mixed PLASTIC
    tangents.

    Returns ``(apply, apply_transpose)`` closures over (n_dofs,)
    vectors.
    """
    from cmad_tpu.ops.linalg import small_solve

    n_dofs = int(pattern.agg_of_dof.shape[0])
    n_nodes = n_dofs // 4
    d = jnp.arange(n_dofs)
    is_u = d < 3 * n_nodes
    node_of_dof = jnp.where(is_u, d // 3, d - 3 * n_nodes)
    slot_of_dof = jnp.where(is_u, d % 3, 3)

    rn, cn = node_of_dof[rows], node_of_dof[cols]
    same = rn == cn
    # off-node entries scatter into a discarded overflow block
    tgt = jnp.where(same, rn, n_nodes)
    blocks = jnp.zeros((n_nodes + 1, 4, 4), dtype=unique.dtype)
    blocks = blocks.at[tgt, slot_of_dof[rows], slot_of_dof[cols]].add(
        jnp.where(same, unique, jnp.zeros((), dtype=unique.dtype)))
    blocks = blocks[:n_nodes]
    # relative ridge keeps rare degenerate blocks invertible without
    # perturbing healthy ones (entries are O(1) after equilibration)
    scale = jnp.max(jnp.abs(blocks), axis=(-2, -1), keepdims=True)
    eye = jnp.eye(4, dtype=unique.dtype)
    blocks = blocks + (10.0 * jnp.finfo(unique.dtype).eps
                       * jnp.maximum(scale, 1e-30)) * eye
    inv_blocks = jax.vmap(
        lambda B: jax.vmap(lambda e: small_solve(B, e))(eye).T)(blocks)

    def _apply_with(inv):
        def apply(r):
            r_nodes = jnp.concatenate(
                [r[:3 * n_nodes].reshape(n_nodes, 3),
                 r[3 * n_nodes:, None]], axis=1)
            z = jnp.einsum("nij,nj->ni", inv, r_nodes)
            return jnp.concatenate([z[:, :3].reshape(-1), z[:, 3]])
        return apply

    return (_apply_with(inv_blocks),
            _apply_with(jnp.swapaxes(inv_blocks, -2, -1)))


def make_two_level_preconditioner(pattern: TwoLevelPattern,
                                  unique: JaxArray, rows: JaxArray,
                                  cols: JaxArray, diag: JaxArray,
                                  symmetric: bool = True,
                                  row_scale: JaxArray | None = None,
                                  smoother: str = "auto"):
    """M^-1 = D^-1 + P (P^T K P)^-1 P^T (additive coarse correction).

    ``symmetric=True`` (SPD K): Cholesky coarse solve, for CG.
    ``symmetric=False`` (saddle points / nonsymmetric K): LU coarse
    solve, for GMRES; returns ``(apply, apply_transpose)`` in that
    case.

    ``smoother``: ``"scalar"`` (|diag| Jacobi), ``"node_block"``
    (per-node 4x4 block Jacobi, mixed width-7 layout only), or
    ``"auto"`` — node-block for the mixed nonsymmetric arm (where the
    scalar smoother is too weak on plastic tangents), scalar elsewhere.

    ``row_scale``: when the operator has been symmetrically equilibrated
    (``Ks = S K S``, ``S = diag(s)``), pass ``row_scale = 1/s`` so the
    coarse basis becomes ``S^-1 P`` — the near-null space of the SCALED
    operator (``K P ~ 0  =>  Ks (S^-1 P) ~ 0``).
    """
    P_eff = None
    if row_scale is not None:
        P_eff = (jnp.asarray(pattern.P_vals, dtype=unique.dtype)
                 * row_scale[:, None])
    A_c = coarse_matrix(pattern, unique, rows, cols, P_vals=P_eff)
    # Symmetric diagonal equilibration + null-column deflation.
    # Rank-deficient aggregate slots (single-node aggregates, prescribed
    # rows, the pressure slot of pure-u problems) leave near-null
    # columns whose diagonal sits ~1e-10 of the max; equilibrating them
    # would amplify junk directions by ~1e5 and a ridge-backed solve
    # then feeds GMRES garbage that can turn NaN in f32. Deflate them:
    # scale to O(1) where the column has energy, zero it where it does
    # not (the identity on dropped slots keeps the LU nonsingular and
    # the outer s-multiplications exactly zero their contribution).
    d_c = jnp.abs(jnp.diag(A_c))
    keep = d_c > (_NULL_COL_REL * jnp.max(d_c))
    s = jnp.where(keep,
                  1.0 / jnp.sqrt(jnp.where(keep, d_c, 1.0)),
                  0.0)
    A_s = (s[:, None] * A_c) * s[None, :]
    # dtype-scaled ridge: a fixed 1e-8 sits below f32 eps (~1.2e-7) and
    # is a no-op on the TPU f32 path; 10*eps regularizes the unit
    # diagonal in whatever precision the solve runs in
    ridge = 10.0 * jnp.finfo(A_s.dtype).eps
    A_s = A_s + jnp.diag(jnp.where(keep, ridge, 1.0)
                         .astype(A_s.dtype))

    # Explicit coarse inverse (size-gated): per-apply triangular solves
    # are latency-bound on TPU; materializing A_s^-1 once (a batched
    # triangular solve against I) turns every apply into one small
    # matmul. As a fixed preconditioner the inverse's extra roundoff
    # (~cond * eps vs the factored solve's) is immaterial; past the
    # ceiling the m^2 build cost stops being free, keep the factored
    # solves.
    explicit_inv = A_s.shape[0] <= _EXPLICIT_INVERSE_CEILING

    if symmetric:
        chol = jax.scipy.linalg.cho_factor(A_s)
        if explicit_inv:
            A_inv = jax.scipy.linalg.cho_solve(
                chol, jnp.eye(A_s.shape[0], dtype=A_s.dtype))
            A_inv = 0.5 * (A_inv + A_inv.T)  # keep M exactly SPD

            def apply(r):
                rhs = s * _apply_PT(pattern, r, P_eff)
                return r / diag + _apply_P(pattern, s * (A_inv @ rhs),
                                           P_eff)

            return apply

        def apply(r):
            rhs = s * _apply_PT(pattern, r, P_eff)
            z_c = s * jax.scipy.linalg.cho_solve(chol, rhs)
            return r / diag + _apply_P(pattern, z_c, P_eff)

        return apply

    lu = jax.scipy.linalg.lu_factor(A_s)
    lu_T = None if explicit_inv else jax.scipy.linalg.lu_factor(A_s.T)

    use_blocks = (smoother == "node_block"
                  or (smoother == "auto" and pattern.width == 7))
    if use_blocks and pattern.width != 7:
        raise ValueError("node_block smoother needs the mixed width-7 "
                         "two-level pattern")
    if use_blocks:
        smooth, smooth_T = _node_block_smoother(pattern, unique, rows,
                                                cols)
    else:
        # |diag| keeps the smoother bounded when the pressure block
        # carries small or sign-flipped diagonal entries
        d_safe = jnp.where(jnp.abs(diag) > 0.0, diag, 1.0)
        smooth = smooth_T = lambda r: r / d_safe

    if explicit_inv:
        A_inv = jax.scipy.linalg.lu_solve(
            lu, jnp.eye(A_s.shape[0], dtype=A_s.dtype))

        def apply(r):
            rhs = s * _apply_PT(pattern, r, P_eff)
            return smooth(r) + _apply_P(pattern, s * (A_inv @ rhs),
                                        P_eff)

        def apply_transpose(r):
            rhs = s * _apply_PT(pattern, r, P_eff)
            return smooth_T(r) + _apply_P(pattern, s * (A_inv.T @ rhs),
                                          P_eff)

        return apply, apply_transpose

    def apply(r):
        z_c = s * jax.scipy.linalg.lu_solve(
            lu, s * _apply_PT(pattern, r, P_eff))
        return smooth(r) + _apply_P(pattern, z_c, P_eff)

    def apply_transpose(r):
        z_c = s * jax.scipy.linalg.lu_solve(
            lu_T, s * _apply_PT(pattern, r, P_eff))
        return smooth_T(r) + _apply_P(pattern, z_c, P_eff)

    return apply, apply_transpose
