"""Exact probability evaluation over a level-scheduled ROBDD.

Shannon recursion as batched device compute: per level, one gather of
child values + one fused multiply-add per node —

    P(node) = p[var] * P(high) + (1 - p[var]) * P(low)

with terminals pinned to 0/1. Exact for any DAG (shared events included),
`vmap`-batched over a trials axis for exact epistemic uncertainty, and
`grad`-able for exact Birnbaum importances (the top probability is
multilinear in p, so reverse-mode through this evaluator *is* the exact
partial-derivative vector).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..compiler.bdd import CompiledBdd

__all__ = ["bdd_probability"]


def bdd_probability(bdd: CompiledBdd, basic_p: jnp.ndarray) -> jnp.ndarray:
    """Top-event probability; ``basic_p``: (..., n_basic); returns (...)."""
    if bdd.n_nodes == 0:
        value = 1.0 if bdd.root_ptr == 1 else 0.0
        return jnp.broadcast_to(jnp.asarray(value, dtype=basic_p.dtype),
                                basic_p.shape[:-1])
    batch_shape = basic_p.shape[:-1]
    vals = jnp.concatenate([
        jnp.zeros(batch_shape + (1,), dtype=basic_p.dtype),
        jnp.ones(batch_shape + (1,), dtype=basic_p.dtype),
        jnp.zeros(batch_shape + (bdd.n_nodes,), dtype=basic_p.dtype),
    ], axis=-1)
    for var_slot, low_ptr, high_ptr, out_ptr in bdd.levels:
        p = basic_p[..., var_slot]
        lo = vals[..., low_ptr]
        hi = vals[..., high_ptr]
        vals = vals.at[..., out_ptr].set(p * hi + (1.0 - p) * lo)
    return vals[..., bdd.root_ptr]
