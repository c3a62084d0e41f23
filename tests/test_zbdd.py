"""BDD-derived minimal cut sets vs the MOCUS generator."""

import numpy as np
import pytest

from canopy_tpu.compiler.bdd import build_bdd
from canopy_tpu.compiler.cutsets import CutSetGenerator
from canopy_tpu.compiler.graph import compile_gates
from canopy_tpu.compiler.zbdd import bdd_minimal_cut_sets
from canopy_tpu.mef.event import Arg, BasicEvent, Connective, Formula, Gate
from canopy_tpu.mef.expr import ConstantExpression
from canopy_tpu.utils.synthetic import synthetic_mef_tree


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


class TestBddCutSets:
    def test_simple_and_or(self):
        a, b, c = make_events([0.1, 0.2, 0.3])
        g1 = Gate("g1")
        g1.formula = Formula(Connective.AND, [Arg(a), Arg(b)])
        top = Gate("top")
        top.formula = Formula(Connective.OR, [Arg(g1), Arg(c)])
        tree = compiled(top)
        cuts = bdd_minimal_cut_sets(build_bdd(tree))
        mocus = CutSetGenerator(tree).generate(top)
        assert set(cuts) == set(mocus)

    def test_shared_events(self):
        a, b, c = make_events([0.1, 0.2, 0.3])
        g1 = Gate("g1")
        g1.formula = Formula(Connective.AND, [Arg(a), Arg(b)])
        g2 = Gate("g2")
        g2.formula = Formula(Connective.AND, [Arg(a), Arg(c)])
        top = Gate("top")
        top.formula = Formula(Connective.OR, [Arg(g1), Arg(g2)])
        tree = compiled(top)
        cuts = bdd_minimal_cut_sets(build_bdd(tree))
        mocus = CutSetGenerator(tree).generate(top)
        assert set(cuts) == set(mocus)

    def test_atleast(self):
        events = make_events([0.1, 0.2, 0.3, 0.4])
        top = Gate("top")
        top.formula = Formula(Connective.ATLEAST, [Arg(e) for e in events],
                              min_number=3)
        tree = compiled(top)
        cuts = bdd_minimal_cut_sets(build_bdd(tree))
        assert len(cuts) == 4
        assert all(len(c) == 3 for c in cuts)

    @pytest.mark.parametrize("seed", [31, 32, 33])
    def test_coherent_synthetic_matches_mocus(self, seed):
        top, events = synthetic_mef_tree(n_basic=25, n_gates=18, fanin=3,
                                         seed=seed, atleast_fraction=0.2,
                                         complement_fraction=0.0)
        tree = compiled(top)
        cuts = set(bdd_minimal_cut_sets(build_bdd(tree), limit_order=30))
        mocus = set(CutSetGenerator(tree, limit_order=30).generate(top))
        assert cuts == mocus

    def test_limit_order_truncation(self):
        events = make_events([0.5] * 5)
        top = Gate("top")
        top.formula = Formula(Connective.AND, [Arg(e) for e in events])
        tree = compiled(top)
        assert bdd_minimal_cut_sets(build_bdd(tree), limit_order=3) == []

    def test_constant_roots(self):
        a, = make_events([0.4])
        g1 = Gate("g1")
        g1.formula = Formula(Connective.NULL, [Arg(a)])
        top = Gate("top")
        top.formula = Formula(Connective.IMPLY, [Arg(g1), Arg(a)])
        tree = compiled(top)
        cuts = bdd_minimal_cut_sets(build_bdd(tree))
        assert cuts == [frozenset()]  # Tautology: the empty product.


class TestNativeMinsol:
    """C++ ZDD minsol vs the Python explicit-set transform."""

    def _both(self, tree, limit_order=20):
        from canopy_tpu.native import native_available
        if not native_available():
            pytest.skip("native library unavailable")
        bdd = build_bdd(tree)
        native = bdd_minimal_cut_sets(bdd, limit_order=limit_order,
                                      use_native=True)
        python = bdd_minimal_cut_sets(bdd, limit_order=limit_order,
                                      use_native=False)
        return native, python

    @pytest.mark.parametrize("seed", [7, 11, 13, 17])
    def test_parity_on_synthetics(self, seed):
        top, _ = synthetic_mef_tree(n_basic=30, n_gates=22, fanin=3,
                                    seed=seed, atleast_fraction=0.2,
                                    complement_fraction=0.1)
        native, python = self._both(compiled(top))
        assert set(native) == set(python)
        assert len(native) == len(set(native))  # ZDD canonical: no dups.

    def test_parity_with_order_bound(self):
        top, _ = synthetic_mef_tree(n_basic=30, n_gates=22, fanin=3,
                                    seed=41, atleast_fraction=0.2)
        native, python = self._both(compiled(top), limit_order=2)
        assert set(native) == set(python)

    def test_constant_and_tautology(self):
        a, b = make_events([0.4, 0.5])
        g1 = Gate("g1")
        g1.formula = Formula(Connective.NULL, [Arg(a)])
        top = Gate("top")
        top.formula = Formula(Connective.IMPLY, [Arg(g1), Arg(a)])
        native, python = self._both(compiled(top))
        assert native == python == [frozenset()]

    def test_max_products_truncation(self):
        from canopy_tpu.native import native_available
        if not native_available():
            pytest.skip("native library unavailable")
        events = make_events([0.1] * 8)
        top = Gate("top")
        top.formula = Formula(Connective.OR, [Arg(e) for e in events])
        bdd = build_bdd(compiled(top))
        cuts = bdd_minimal_cut_sets(bdd, use_native=True, max_products=3)
        assert len(cuts) == 3

    def test_truncation_reported(self):
        from canopy_tpu.native import native_available

        events = make_events([0.5] * 5)
        top = Gate("topt")
        top.formula = Formula(Connective.AND, [Arg(e) for e in events])
        bdd = build_bdd(compiled(top))
        for native in ([True] if native_available() else []) + [False]:
            products, truncated = bdd_minimal_cut_sets(
                bdd, limit_order=3, use_native=native,
                with_truncation=True)
            assert products == [] and truncated, native
            products, truncated = bdd_minimal_cut_sets(
                bdd, limit_order=10, use_native=native,
                with_truncation=True)
            assert len(products) == 1 and not truncated, native
        if native_available():
            wide = make_events([0.1] * 8)
            top2 = Gate("topw")
            top2.formula = Formula(Connective.OR, [Arg(e) for e in wide])
            bdd2 = build_bdd(compiled(top2))
            products, truncated = bdd_minimal_cut_sets(
                bdd2, use_native=True, max_products=3,
                with_truncation=True)
            assert len(products) == 3 and truncated
