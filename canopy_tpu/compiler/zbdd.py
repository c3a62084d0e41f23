"""Minimal cut sets from a BDD (the ZBDD minimal-solutions transform).

Completes the BDD algorithm's qualitative side (reference
``settings.h:13``: bdd/zbdd are the default algorithms; MOCUS is the
fallback generator in ``compiler/cutsets.py``). Rauzy's minimal-solutions
recursion over the ROBDD:

    mcs(0) = {};  mcs(1) = {{}}
    mcs(v ? h : l) = mcs(l)  ∪  { {v} ∪ c : c ∈ mcs(h) ⊖ mcs(l) }

where ``⊖`` removes solutions subsumed by any solution of the low branch
(the "without" set). For monotone (coherent) functions this yields
exactly the minimal cut sets; for non-coherent functions it yields the
minimal solutions with positive literals along high edges (the
prime-implicant-lite family that matches minimal-cut-set mode; use the
MOCUS generator with ``prime_implicants`` for full literal products).

Truncation by ``limit_order`` happens inside the recursion (solutions are
dropped as soon as they exceed the order bound), so large BDDs with short
cut sets stay cheap.
"""

from __future__ import annotations

from ..errors import LogicError
from .bdd import CompiledBdd

__all__ = ["bdd_minimal_cut_sets"]


def bdd_minimal_cut_sets(bdd: CompiledBdd, limit_order: int = 20
                         ) -> list[frozenset]:
    """Minimal products (as frozensets of (basic_slot, False) literals).

    Requires the raw node arrays on the CompiledBdd (``raw_var`` etc.,
    attached by ``build_bdd``).
    """
    if bdd.raw_var is None:
        raise LogicError("CompiledBdd is missing raw node arrays.")
    var_arr, low_arr, high_arr = bdd.raw_var, bdd.raw_low, bdd.raw_high
    slot_of_var = bdd.slot_of_var

    memo: dict[int, list[frozenset]] = {}

    def subsume(solutions: list[frozenset],
                against: list[frozenset]) -> list[frozenset]:
        return [c for c in solutions
                if not any(a <= c for a in against)]

    def minimize(solutions: list[frozenset]) -> list[frozenset]:
        ordered = sorted(set(solutions), key=len)
        out: list[frozenset] = []
        for candidate in ordered:
            if not any(kept <= candidate for kept in out):
                out.append(candidate)
        return out

    def rec(node: int) -> list[frozenset]:
        if node == 0:
            return []
        if node == 1:
            return [frozenset()]
        found = memo.get(node)
        if found is not None:
            return found
        low_sols = rec(int(low_arr[node]))
        high_sols = rec(int(high_arr[node]))
        literal = (slot_of_var[int(var_arr[node])], False)
        with_var = [
            frozenset(c | {literal})
            for c in subsume(high_sols, low_sols)
            if len(c) < limit_order]
        result = minimize(low_sols + with_var)
        memo[node] = result
        return result

    # Iterative deepening of the recursion stack is unnecessary: depth is
    # bounded by the variable count, but guard Python's limit anyway.
    import sys
    limit = sys.getrecursionlimit()
    needed = bdd.n_basic + 1000
    if needed > limit:
        sys.setrecursionlimit(needed)
    try:
        return rec(bdd.root if bdd.n_nodes else
                   (1 if bdd.root_ptr == 1 else 0))
    finally:
        sys.setrecursionlimit(limit)
