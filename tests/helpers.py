"""Shared test helpers: model building and brute-force oracles."""

from __future__ import annotations

import itertools

from canopy_tpu.io.xml import Document
from canopy_tpu.mef import Initializer
from canopy_tpu.mef.event import (BasicEvent, Connective, FALSE_EVENT, Gate,
                                  HouseEvent, TRUE_EVENT)
from canopy_tpu.settings import Settings


def build_model(xml: str, settings: Settings | None = None,
                allow_extern: bool = False):
    """Parse an in-memory MEF document into a validated model."""
    if settings is None:
        settings = Settings().probability_analysis(True)
    init = Initializer.from_documents([Document.from_string(xml)], settings,
                                      allow_extern=allow_extern)
    return init.model


def eval_formula(formula, state: dict[str, bool]) -> bool:
    """Scalar truth-value oracle for a formula given basic-event states."""
    values = []
    for arg in formula.args:
        event = arg.event
        if isinstance(event, Gate):
            v = eval_formula(event.formula, state)
        elif isinstance(event, HouseEvent):
            v = event.state
        else:
            v = state[event.id]
        values.append(not v if arg.complement else v)
    c = formula.connective
    n_true = sum(values)
    if c is Connective.AND:
        return all(values)
    if c is Connective.OR:
        return any(values)
    if c is Connective.NAND:
        return not all(values)
    if c is Connective.NOR:
        return not any(values)
    if c is Connective.NOT:
        return not values[0]
    if c is Connective.NULL:
        return values[0]
    if c is Connective.XOR:
        return values[0] != values[1]
    if c is Connective.IFF:
        return values[0] == values[1]
    if c is Connective.IMPLY:
        return (not values[0]) or values[1]
    if c is Connective.ATLEAST:
        return n_true >= formula.min_number
    if c is Connective.CARDINALITY:
        return formula.min_number <= n_true <= formula.max_number
    raise AssertionError(c)


def brute_force_probability(gate: Gate, basic_events: list[BasicEvent]) -> float:
    """Exact top probability by enumerating all 2^n basic-event states.

    Handles repeated events exactly (the gold standard the propagation and
    cut-set engines are checked against).
    """
    total = 0.0
    ids = [e.id for e in basic_events]
    probs = [e.p() for e in basic_events]
    for states in itertools.product([False, True], repeat=len(ids)):
        state = dict(zip(ids, states))
        if eval_formula(gate.formula, state):
            weight = 1.0
            for s, p in zip(states, probs):
                weight *= p if s else (1.0 - p)
            total += weight
    return total
