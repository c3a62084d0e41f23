"""Module detection + modular BDD quantification tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from canopy_tpu.compiler.bdd import build_bdd
from canopy_tpu.compiler.graph import compile_gates
from canopy_tpu.compiler.modules import (build_modular_bdd, find_modules,
                                         modular_probability)
from canopy_tpu.engine.bdd_eval import bdd_probability
from canopy_tpu.engine.propagate import mean_basic_probabilities
from canopy_tpu.mef.event import Arg, BasicEvent, Connective, Formula, Gate
from canopy_tpu.mef.expr import ConstantExpression
from canopy_tpu.utils.synthetic import synthetic_mef_tree

from helpers import brute_force_probability


def make_events(probs, prefix="e"):
    events = []
    for i, p in enumerate(probs):
        e = BasicEvent(f"{prefix}{i}")
        e.expression = ConstantExpression(p)
        events.append(e)
    return events


def compiled(gate):
    tree = compile_gates([gate])
    tree.top_index = tree.gate_index[gate.id]
    return tree


class TestDetection:
    def test_independent_subtrees_are_modules(self):
        a = make_events([0.1, 0.2], "a")
        b = make_events([0.3, 0.4], "b")
        g1 = Gate("g1")
        g1.formula = Formula(Connective.AND, [Arg(e) for e in a])
        g2 = Gate("g2")
        g2.formula = Formula(Connective.OR, [Arg(e) for e in b])
        top = Gate("top")
        top.formula = Formula(Connective.OR, [Arg(g1), Arg(g2)])
        tree = compiled(top)
        modules = find_modules(tree)
        names = {next(g.id for g in tree.gates
                      if tree.gate_index[g.id] == s) for s in modules}
        assert names == {"g1", "g2"}

    def test_shared_event_breaks_module(self):
        a, b, c = make_events([0.1, 0.2, 0.3])
        g1 = Gate("g1")
        g1.formula = Formula(Connective.AND, [Arg(a), Arg(b)])
        g2 = Gate("g2")
        g2.formula = Formula(Connective.AND, [Arg(a), Arg(c)])  # shares a.
        top = Gate("top")
        top.formula = Formula(Connective.OR, [Arg(g1), Arg(g2)])
        tree = compiled(top)
        assert find_modules(tree) == []

    def test_nested_modules(self):
        events = make_events([0.1, 0.2, 0.3, 0.4])
        inner = Gate("inner")
        inner.formula = Formula(Connective.AND,
                                [Arg(events[0]), Arg(events[1])])
        outer = Gate("outer")
        outer.formula = Formula(Connective.OR, [Arg(inner), Arg(events[2])])
        top = Gate("top")
        top.formula = Formula(Connective.AND, [Arg(outer), Arg(events[3])])
        tree = compiled(top)
        modules = find_modules(tree)
        names = {next(g.id for g in tree.gates
                      if tree.gate_index[g.id] == s) for s in modules}
        assert names == {"inner", "outer"}


class TestModularQuantification:
    def test_matches_monolithic_bdd(self):
        a = make_events([0.1, 0.2, 0.3], "a")
        b = make_events([0.25, 0.35], "b")
        g1 = Gate("g1")
        g1.formula = Formula(Connective.ATLEAST, [Arg(e) for e in a],
                             min_number=2)
        g2 = Gate("g2")
        g2.formula = Formula(Connective.AND,
                             [Arg(b[0]), Arg(b[1], True)])
        top = Gate("top")
        top.formula = Formula(Connective.OR, [Arg(g1), Arg(g2)])
        tree = compiled(top)
        p = jnp.asarray(mean_basic_probabilities(tree))
        mono = float(bdd_probability(build_bdd(tree), p))
        modular = build_modular_bdd(tree)
        assert len(modular.chain) == 3  # g1, g2, top.
        got = float(modular_probability(modular, p))
        assert abs(got - mono) < 1e-14

    @pytest.mark.parametrize("seed", [41, 42, 43, 44])
    def test_random_trees_match_and_shrink(self, seed):
        top, events = synthetic_mef_tree(n_basic=30, n_gates=22, fanin=3,
                                         seed=seed, atleast_fraction=0.15)
        tree = compile_gates([top])
        tree.top_index = tree.gate_index[top.id]
        p = jnp.asarray(mean_basic_probabilities(tree))
        mono_bdd = build_bdd(tree)
        mono = float(bdd_probability(mono_bdd, p))
        modular = build_modular_bdd(tree)
        got = float(modular_probability(modular, p))
        assert abs(got - mono) < 1e-12
        # Modules keep individual BDDs small (they can exceed the
        # monolithic count slightly when per-module variable orders are
        # unluckier, but never blow up).
        assert modular.largest <= mono_bdd.n_nodes * 3 + 8

    def test_batched_and_grad(self):
        import jax
        a = make_events([0.1, 0.2], "a")
        b = make_events([0.3, 0.4], "b")
        g1 = Gate("g1")
        g1.formula = Formula(Connective.AND, [Arg(e) for e in a])
        g2 = Gate("g2")
        g2.formula = Formula(Connective.OR, [Arg(e) for e in b])
        top = Gate("top")
        top.formula = Formula(Connective.OR, [Arg(g1), Arg(g2)])
        tree = compiled(top)
        modular = build_modular_bdd(tree)
        batch = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (16, 4)))
        out = modular_probability(modular, batch)
        assert out.shape == (16,)
        mono = build_bdd(tree)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(bdd_probability(mono, batch)),
            rtol=1e-12)
        g = jax.grad(lambda q: modular_probability(modular, q))(
            jnp.asarray(mean_basic_probabilities(tree)))
        g_mono = jax.grad(lambda q: bdd_probability(mono, q))(
            jnp.asarray(mean_basic_probabilities(tree)))
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_mono),
                                   rtol=1e-12)
