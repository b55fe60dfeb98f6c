"""Experiment-parallel calibration over a device mesh.

SURVEY.md section 2.2 row 2: the reference runs multi-experiment
calibrations as a serial Python loop (one adjoint objective per
experiment); cmad_tpu's single-device form vmaps every experiment's
whole time loop into one compiled objective
(`calibrations/al7079/multi_experiment_hill_calibration.py`). This
module lifts that batch onto a device mesh: experiments shard across
devices, parameters replicate, and XLA inserts the gradient `psum`
when the per-experiment losses reduce to the scalar objective — the
data-parallel training-step recipe, with experiments as the batch axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_experiments(tree, mesh: Mesh, axis_name: str = "elem"):
    """Place per-experiment arrays (leading axis = experiment) on the
    mesh, zero-padding the experiment axis up to the device count
    (jit in_shardings requires even sharding).

    Returns ``(padded_tree, weights)``: ``weights`` is 1.0 on real
    experiments and 0.0 on pad replicas — fold it into the loss
    (``sum(w * J_i)``) so the pads contribute nothing.
    """
    n_dev = int(jnp.prod(jnp.asarray(list(mesh.shape.values()))))
    shard = NamedSharding(mesh, P(axis_name))
    leaves = jax.tree_util.tree_leaves(tree)
    n_exp = int(leaves[0].shape[0])
    pad_n = (-n_exp) % n_dev

    def place(x):
        x = jnp.asarray(x)
        if pad_n:
            x = jnp.concatenate([x, jnp.repeat(x[:1], pad_n, axis=0)])
        return jax.device_put(x, shard)

    padded = jax.tree_util.tree_map(place, tree)
    weights = jax.device_put(
        jnp.concatenate([jnp.ones(n_exp), jnp.zeros(pad_n)]), shard)
    return padded, weights


def make_sharded_objective(objective_of_batch, mesh: Mesh,
                           n_batch_args: int = 2,
                           axis_name: str = "elem"):
    """jit a ``(actives, *experiment_batches) -> scalar`` objective with
    the ``n_batch_args`` experiment batches sharded and the actives /
    gradient replicated.

    ``objective_of_batch`` must reduce over the experiment axis itself
    (a plain ``vmap(...).sum()`` — XLA turns the reduction into the
    cross-device psum).
    """
    shard = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def value_and_grad(a, *batches):
        return jax.value_and_grad(objective_of_batch)(a, *batches)

    return jax.jit(
        value_and_grad,
        in_shardings=(repl, *([shard] * n_batch_args)),
        out_shardings=(repl, repl))
