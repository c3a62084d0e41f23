"""Bottom-up probability propagation over the compiled gate graph.

The quantitative core that replaces the reference's absent evaluation
engine: given per-basic-event probabilities (optionally batched over a
trials axis) and house-event states, propagate through the level schedule
to get every gate's probability under the independence assumption.

TPU shape of the computation, per level (see ``compiler/graph.py``):

* ``prod`` family — one gather from the value vector, one elementwise
  conditional complement (fused by XLA), one product-reduce along the
  padded fan-in axis, one scatter. This is the CSR-SpMV access pattern
  with the "+/x" semiring replaced by product-of-complements; batched over
  trials it becomes the SpMM pattern that feeds the MXU-friendly layouts.
* ``pair`` family — closed-form xor/iff on two gathered columns.
* ``count`` family — a Poisson-binomial dynamic program: a `lax.scan`
  over the padded argument axis carrying a ``(G, cap+1)`` count
  distribution with an absorbing cap. Exact for atleast/cardinality
  without combinatorial expansion.

Everything is `jit`/`vmap`/`grad`-compatible: batching over trials gives
the uncertainty engine, and `jax.grad` through this function gives every
Birnbaum importance in one backward pass (see ``engine/importance.py``).

Exactness note: like any bottom-up probability propagation, results are
exact when no basic event feeds two different argument paths of the same
gate subgraph (tree-like structure) and conservative-approximate otherwise;
the analysis driver cross-checks against cut-set quantification and
Monte-Carlo state sampling for shared-event models (SCRAM semantics:
BDD-exact analysis is the round-2 target).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..compiler.graph import CompiledTree, CountBlock, LevelBlock, PairBlock, ProdBlock

__all__ = ["propagate_probability", "top_event_probability",
           "make_propagator"]


def _eval_prod(vals: jnp.ndarray, block: ProdBlock) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate the product family: returns (out_idx, out_values)."""
    v = vals[..., block.arg_idx]                      # (..., G, F) gather
    flip = jnp.asarray(block.arg_flip)
    mask = jnp.asarray(block.arg_mask)
    x = jnp.where(flip, 1.0 - v, v)
    x = jnp.where(mask, x, 1.0)                       # Neutral pad.
    p = jnp.prod(x, axis=-1)
    out = jnp.where(jnp.asarray(block.inv_out), 1.0 - p, p)
    return jnp.asarray(block.out_idx), out


def _eval_pair(vals: jnp.ndarray, block: PairBlock) -> tuple[jnp.ndarray, jnp.ndarray]:
    v = vals[..., block.arg_idx]                      # (..., G, 2)
    neg = jnp.asarray(block.arg_neg)
    v = jnp.where(neg, 1.0 - v, v)
    a, b = v[..., 0], v[..., 1]
    xor = a + b - 2.0 * a * b
    out = jnp.where(jnp.asarray(block.is_iff), 1.0 - xor, xor)
    return jnp.asarray(block.out_idx), out


def _eval_count(vals: jnp.ndarray, block: CountBlock) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Poisson-binomial DP over the argument axis with absorbing cap.

    Carries dp of shape (..., G, cap+1): dp[..., j] = P(exactly j of the
    arguments processed so far are true), with state ``cap`` meaning
    ">= cap". The final per-gate output sums dp over [min_num, max_num]
    (the cap absorbs correctly because cap > max_num for every gate in
    the block by construction).
    """
    v = vals[..., block.arg_idx]                       # (..., G, F)
    neg = jnp.asarray(block.arg_neg)
    mask = jnp.asarray(block.arg_mask)
    v = jnp.where(neg, 1.0 - v, v)
    v = jnp.where(mask, v, 0.0)                        # Pad: never true.

    cap = block.cap
    batch_shape = v.shape[:-1]                         # (..., G)
    dp0 = jnp.zeros(batch_shape + (cap + 1,), dtype=v.dtype)
    dp0 = dp0.at[..., 0].set(1.0)

    def step(dp, p_col):
        # p_col: (..., G) probability of this argument being true.
        p = p_col[..., None]
        shifted = jnp.concatenate(
            [jnp.zeros_like(dp[..., :1]), dp[..., :-1]], axis=-1)
        new = dp * (1.0 - p) + shifted * p
        # Absorb: mass that was already at cap and drew "true" stays.
        new = new.at[..., cap].add(dp[..., cap] * p[..., 0])
        return new, None

    # Scan over the fan-in axis (moved to front).
    v_scan = jnp.moveaxis(v, -1, 0)                    # (F, ..., G)
    dp, _ = jax.lax.scan(step, dp0, v_scan)

    counts = jnp.arange(cap + 1)
    min_num = jnp.asarray(block.min_num)[..., None]    # (G, 1)
    max_num = jnp.asarray(block.max_num)[..., None]
    in_range = (counts >= min_num) & (counts <= max_num)
    out = jnp.sum(jnp.where(in_range, dp, 0.0), axis=-1)
    return jnp.asarray(block.out_idx), out


def _eval_level(vals: jnp.ndarray, level: LevelBlock) -> jnp.ndarray:
    for block, evaluator in ((level.prod, _eval_prod),
                             (level.pair, _eval_pair),
                             (level.count, _eval_count)):
        if block is not None and block.n_gates:
            idx, out = evaluator(vals, block)
            vals = vals.at[..., idx].set(out)
    return vals


def propagate_probability(tree: CompiledTree, basic_p: jnp.ndarray,
                          house_states: jnp.ndarray) -> jnp.ndarray:
    """Propagate probabilities; returns the full value vector.

    ``basic_p``: (..., n_basic) probabilities; leading axes batch (trials).
    ``house_states``: (..., n_house) 0/1 floats.
    Returns (..., n_nodes) with every gate's probability filled in.
    """
    batch_shape = jnp.broadcast_shapes(basic_p.shape[:-1],
                                       house_states.shape[:-1]
                                       if tree.n_house else ())
    basic_p = jnp.broadcast_to(basic_p, batch_shape + (tree.n_basic,))
    parts = [basic_p]
    if tree.n_house:
        parts.append(jnp.broadcast_to(
            house_states, batch_shape + (tree.n_house,)))
    parts.append(jnp.zeros(batch_shape + (tree.n_gates,),
                           dtype=basic_p.dtype))
    vals = jnp.concatenate(parts, axis=-1)
    for level in tree.levels:
        vals = _eval_level(vals, level)
    return vals


def top_event_probability(tree: CompiledTree, basic_p: jnp.ndarray,
                          house_states: jnp.ndarray | None = None) -> jnp.ndarray:
    """The top event's probability (requires ``tree.top_index``)."""
    if house_states is None:
        house_states = jnp.asarray(tree.house_state_vector())
    vals = propagate_probability(tree, basic_p, house_states)
    return vals[..., tree.top_index]


def make_propagator(tree: CompiledTree, output: str = "top"):
    """A jitted closure ``f(basic_p, house_states) -> prob``.

    ``output``: "top" for the top-event scalar, "all" for the full value
    vector. The compiled block arrays are embedded as constants, so one
    compilation serves any number of probability vectors (time steps,
    uncertainty trials via ``vmap``, importance via ``grad``).
    """
    if output == "top":
        fn = functools.partial(top_event_probability, tree)
    else:
        fn = functools.partial(propagate_probability, tree)
    return jax.jit(fn)


def mean_basic_probabilities(tree: CompiledTree) -> np.ndarray:
    """Host-side mean probability vector from the MEF expressions."""
    return np.array([event.p() for event in tree.basic_events],
                    dtype=np.float64)
