"""Importance analysis via automatic differentiation.

The importance surface of the reference Settings
(``settings.h:262-278``), computed the TPU-native way: because the
propagated top-event probability is *multilinear* in each basic-event
probability, the Birnbaum marginal importance factor

    MIF_i = dP(top)/dp_i = P(top | x_i=1) - P(top | x_i=0)

is exact, and one reverse-mode pass through the propagation engine yields
every event's MIF at once — replacing the classical 2N+1 re-evaluations.
All other measures derive algebraically from (P, p, MIF):

    P(top | x_i=1) = P + (1 - p_i) * MIF_i
    P(top | x_i=0) = P - p_i * MIF_i
    CIF_i = p_i * MIF_i / P            (criticality)
    DIF_i = p_i * P(top|x_i=1) / P     (diagnosis / Fussell-Vesely-style)
    RAW_i = P(top|x_i=1) / P           (risk achievement worth)
    RRW_i = P / P(top|x_i=0)           (risk reduction worth)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..compiler.graph import CompiledTree
from .propagate import top_event_probability

__all__ = ["ImportanceResult", "importance_measures",
           "make_stream_importance_fn", "occurrence_counts"]


@dataclasses.dataclass
class ImportanceResult:
    """Per-basic-event importance measures (arrays indexed by basic slot)."""

    top_probability: float
    mif: np.ndarray
    cif: np.ndarray
    dif: np.ndarray
    raw: np.ndarray
    rrw: np.ndarray
    occurrences: np.ndarray | None = None

    def as_table(self, tree: CompiledTree) -> list[dict]:
        rows = []
        for event_id, slot in tree.basic_index.items():
            row = {"event": event_id,
                   "MIF": float(self.mif[slot]),
                   "CIF": float(self.cif[slot]),
                   "DIF": float(self.dif[slot]),
                   "RAW": float(self.raw[slot]),
                   "RRW": float(self.rrw[slot])}
            if self.occurrences is not None:
                row["occurrence"] = int(self.occurrences[slot])
            rows.append(row)
        return rows


def importance_measures(tree: CompiledTree, basic_p: jnp.ndarray,
                        house_states: jnp.ndarray | None = None,
                        top_fn=None) -> ImportanceResult:
    """All importance measures from one forward + one backward pass.

    ``top_fn(p) -> P(top)`` overrides the evaluator (e.g. the exact BDD
    evaluator); default is direct propagation.
    """
    if house_states is None:
        house_states = jnp.asarray(tree.house_state_vector())

    def top(p):
        if top_fn is not None:
            return top_fn(p)
        return top_event_probability(tree, p, house_states)

    p_top, mif = jax.value_and_grad(top)(jnp.asarray(basic_p))
    p = jnp.asarray(basic_p)
    p_one = p_top + (1.0 - p) * mif
    p_zero = p_top - p * mif
    safe_top = jnp.where(p_top > 0, p_top, 1.0)
    cif = jnp.where(p_top > 0, p * mif / safe_top, 0.0)
    dif = jnp.where(p_top > 0, p * p_one / safe_top, 0.0)
    raw = jnp.where(p_top > 0, p_one / safe_top, 0.0)
    safe_zero = jnp.where(p_zero > 0, p_zero, 1.0)
    rrw = jnp.where(p_zero > 0, p_top / safe_zero, jnp.inf)
    return ImportanceResult(
        top_probability=float(p_top),
        mif=np.asarray(mif), cif=np.asarray(cif), dif=np.asarray(dif),
        raw=np.asarray(raw), rrw=np.asarray(rrw))


def make_stream_importance_fn(tree: CompiledTree,
                              house_states: np.ndarray | None = None,
                              interpret: bool = False):
    """A differentiable ``top_fn(p)`` backed by the adjoint stream
    kernels (``ops/adjoint_kernel.py``), or ``None`` when the tree has
    no stream/adjoint schedule (callers keep the gather autodiff).

    The point probability broadcasts onto one (8, 128) trial tile —
    1024 identical lanes — and the mean folds them back; the VJP runs
    as the explicit backward streaming kernel instead of XLA autodiff
    through the gather engine. Direct-propagation semantics (same math
    as the stream engine; exact-BDD callers use
    ``make_modular_evaluator(differentiable=True)`` instead).
    """
    from ..errors import LogicError
    from ..ops.adjoint_kernel import (compile_adjoint,
                                      make_differentiable_stream)
    from ..ops.stream_kernel import compile_stream, stage_basic
    try:
        program = compile_stream(tree)
        aprog = compile_adjoint(program)
    except LogicError:
        # Pool-thrashing trees: the replay engine's adjoint
        # (compiler/replay_adjoint.py) — importance at spill scale.
        return _make_replay_importance_fn(tree, house_states, interpret)
    house = tree.house_state_vector() if house_states is None \
        else np.asarray(house_states)
    f = make_differentiable_stream(aprog, house, interpret=interpret)

    def top_fn(p):
        bp = jnp.broadcast_to(p.astype(jnp.float32), (1024, tree.n_basic))
        return f(stage_basic(program, bp)).mean()
    return top_fn


def _make_replay_importance_fn(tree: CompiledTree, house_states,
                               interpret: bool):
    from ..compiler.replay_adjoint import build_replay_adjoint
    from ..errors import LogicError
    from ..ops.replay_adjoint_kernel import make_differentiable_replay
    from ..ops.stream_kernel import stage_replay
    try:
        # Forward segments capped at 2048 ops: the taped forward adds a
        # tape put per argument, and host tracing of straight-line
        # Pallas kernels is superlinear in per-kernel size (the ~15k
        # tile-op wall) — the default 8192-op segments trace for tens
        # of minutes at plant scale.  The backward splits itself into
        # ``max_bwd_ops`` sub-kernels (compiler/replay_adjoint.py).
        aprog = build_replay_adjoint(tree, max_ops_per_segment=2048)
    except LogicError:
        return None
    house = tree.house_state_vector() if house_states is None \
        else np.asarray(house_states)
    f = make_differentiable_replay(aprog, house, interpret=interpret)

    def top_fn(p):
        bp = jnp.broadcast_to(p.astype(jnp.float32), (1024, tree.n_basic))
        return f(stage_replay(aprog.base, bp)).mean()
    return top_fn


def occurrence_counts(products, n_basic: int) -> np.ndarray:
    """How many minimal products each basic event appears in."""
    counts = np.zeros(n_basic, dtype=np.int64)
    for product in products:
        for slot, _neg in product:
            counts[slot] += 1
    return counts
