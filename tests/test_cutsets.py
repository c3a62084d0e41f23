"""Cut-set generation + quantification tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from canopy_tpu.compiler.cutsets import CutSetGenerator
from canopy_tpu.compiler.graph import compile_gates
from canopy_tpu.engine.cutset_quantify import (build_cutset_matrix, mcub,
                                               product_probabilities,
                                               rare_event)
from canopy_tpu.engine.propagate import mean_basic_probabilities
from canopy_tpu.mef.event import (Arg, BasicEvent, Connective, Formula, Gate)
from canopy_tpu.mef.expr import ConstantExpression

from helpers import brute_force_probability


def make_events(probs):
    events = []
    for i, p in enumerate(probs):
        e = BasicEvent(f"e{i}")
        e.expression = ConstantExpression(p)
        events.append(e)
    return events


def compiled(gate):
    tree = compile_gates([gate])
    tree.top_index = tree.gate_index[gate.id]
    return tree


def named_products(tree, products):
    inv = {slot: eid for eid, slot in tree.basic_index.items()}
    return {frozenset((inv[s], n) for s, n in p) for p in products}


class TestGeneration:
    def test_and_or(self):
        a, b, c = make_events([0.1, 0.2, 0.3])
        g1 = Gate("g1")
        g1.formula = Formula(Connective.AND, [Arg(a), Arg(b)])
        top = Gate("top")
        top.formula = Formula(Connective.OR, [Arg(g1), Arg(c)])
        tree = compiled(top)
        products = CutSetGenerator(tree).generate(top)
        assert named_products(tree, products) == {
            frozenset({("e0", False), ("e1", False)}),
            frozenset({("e2", False)})}

    def test_absorption(self):
        """{a} absorbs {a,b}: a or (a and b) -> {a}."""
        a, b = make_events([0.1, 0.2])
        g1 = Gate("g1")
        g1.formula = Formula(Connective.AND, [Arg(a), Arg(b)])
        top = Gate("top")
        top.formula = Formula(Connective.OR, [Arg(g1), Arg(a)])
        tree = compiled(top)
        products = CutSetGenerator(tree).generate(top)
        assert named_products(tree, products) == {frozenset({("e0", False)})}

    def test_atleast_expansion(self):
        events = make_events([0.1, 0.2, 0.3])
        top = Gate("top")
        top.formula = Formula(Connective.ATLEAST, [Arg(e) for e in events],
                              min_number=2)
        tree = compiled(top)
        products = CutSetGenerator(tree).generate(top)
        assert len(products) == 3
        assert all(len(p) == 2 for p in products)

    def test_complement_literals(self):
        a, b = make_events([0.1, 0.2])
        top = Gate("top")
        top.formula = Formula(Connective.AND, [Arg(a, True), Arg(b)])
        tree = compiled(top)
        products = CutSetGenerator(tree).generate(top)
        assert named_products(tree, products) == {
            frozenset({("e0", True), ("e1", False)})}

    def test_contradiction_dropped(self):
        """(a and not a) has no products."""
        a, b = make_events([0.1, 0.2])
        g1 = Gate("g1")
        g1.formula = Formula(Connective.AND, [Arg(a), Arg(b)])
        top = Gate("top")
        top.formula = Formula(Connective.AND, [Arg(g1), Arg(a, True)])
        tree = compiled(top)
        products = CutSetGenerator(tree).generate(top)
        assert products == []

    def test_limit_order_truncation(self):
        events = make_events([0.5] * 5)
        top = Gate("top")
        top.formula = Formula(Connective.AND, [Arg(e) for e in events])
        tree = compiled(top)
        generator = CutSetGenerator(tree, limit_order=3)
        assert generator.generate(top) == []
        assert generator.truncated

    def test_cut_off_truncation(self):
        a, b = make_events([1e-6, 0.5])
        extra = BasicEvent("extra")
        extra.expression = ConstantExpression(0.5)
        g1 = Gate("g1")
        g1.formula = Formula(Connective.AND, [Arg(a), Arg(extra)])
        top = Gate("top")
        top.formula = Formula(Connective.OR, [Arg(g1), Arg(b)])
        tree = compiled(top)
        generator = CutSetGenerator(
            tree, cut_off=1e-3,
            probabilities=mean_basic_probabilities(tree))
        products = generator.generate(top)
        assert len(products) == 1
        assert generator.truncated

    def test_xor_products(self):
        a, b = make_events([0.3, 0.6])
        top = Gate("top")
        top.formula = Formula(Connective.XOR, [Arg(a), Arg(b)])
        tree = compiled(top)
        products = CutSetGenerator(tree).generate(top)
        assert named_products(tree, products) == {
            frozenset({("e0", False), ("e1", True)}),
            frozenset({("e0", True), ("e1", False)})}

    def test_shared_event_dag(self):
        """Shared events produce correct minimal cuts (the propagation
        engine's weak spot is exact here)."""
        a, b, c = make_events([0.1, 0.2, 0.3])
        g1 = Gate("g1")
        g1.formula = Formula(Connective.AND, [Arg(a), Arg(b)])
        g2 = Gate("g2")
        g2.formula = Formula(Connective.AND, [Arg(a), Arg(c)])
        top = Gate("top")
        top.formula = Formula(Connective.OR, [Arg(g1), Arg(g2)])
        tree = compiled(top)
        products = CutSetGenerator(tree).generate(top)
        assert named_products(tree, products) == {
            frozenset({("e0", False), ("e1", False)}),
            frozenset({("e0", False), ("e2", False)})}


class TestQuantification:
    def test_rare_event_and_mcub_bracket_exact(self):
        """For coherent trees: rare-event >= exact >= ... with MCUB also
        an upper bound; both close for small probabilities."""
        probs = [1e-3, 2e-3, 5e-4, 1e-3]
        events = make_events(probs)
        g1 = Gate("g1")
        g1.formula = Formula(Connective.AND, [Arg(events[0]), Arg(events[1])])
        g2 = Gate("g2")
        g2.formula = Formula(Connective.AND, [Arg(events[0]), Arg(events[2])])
        top = Gate("top")
        top.formula = Formula(Connective.OR, [Arg(g1), Arg(g2),
                                              Arg(events[3])])
        tree = compiled(top)
        products = CutSetGenerator(tree).generate(top)
        matrix = build_cutset_matrix(products, tree.n_basic)
        p = jnp.asarray(mean_basic_probabilities(tree))
        q = product_probabilities(matrix, p)
        exact = brute_force_probability(top, events)
        re_val = float(rare_event(q))
        mcub_val = float(mcub(q))
        assert re_val >= exact - 1e-15
        assert mcub_val >= exact - 1e-12 or abs(mcub_val - exact) < 1e-9
        assert abs(re_val - exact) < 1e-5
        assert abs(mcub_val - exact) < 1e-5

    def test_batched_spmm_shape(self):
        events = make_events([0.1, 0.2, 0.3])
        top = Gate("top")
        top.formula = Formula(Connective.ATLEAST, [Arg(e) for e in events],
                              min_number=2)
        tree = compiled(top)
        products = CutSetGenerator(tree).generate(top)
        matrix = build_cutset_matrix(products, tree.n_basic)
        batch = jnp.asarray(np.random.default_rng(0).uniform(
            0, 0.1, (17, tree.n_basic)))
        q = product_probabilities(matrix, batch)
        assert q.shape == (17, matrix.n_products)

    def test_empty_products(self):
        matrix = build_cutset_matrix([], 3)
        q = product_probabilities(matrix, jnp.asarray([0.1, 0.2, 0.3]))
        assert float(rare_event(q)) == 0.0
        assert float(mcub(q)) == 0.0

    def test_csr_layout(self):
        a, b, c = make_events([0.1, 0.2, 0.3])
        top = Gate("top")
        top.formula = Formula(Connective.OR, [Arg(a, True), Arg(b)])
        tree = compiled(top)
        products = CutSetGenerator(tree).generate(top)
        matrix = build_cutset_matrix(products, tree.n_basic)
        assert matrix.nnz == 2
        assert matrix.indptr.tolist() == [0, 1, 2]
        assert set(matrix.signs.tolist()) == {-1, 1}
