"""BDD engine tests: exactness on shared-event DAGs vs brute force."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canopy_tpu.compiler.bdd import BddForest, build_bdd
from canopy_tpu.compiler.graph import compile_fault_tree, compile_gates
from canopy_tpu.engine.bdd_eval import bdd_probability
from canopy_tpu.engine.propagate import mean_basic_probabilities
from canopy_tpu.mef.event import (Arg, BasicEvent, Connective, Formula, Gate)
from canopy_tpu.mef.expr import ConstantExpression

from helpers import brute_force_probability, build_model


def make_events(probs):
    events = []
    for i, p in enumerate(probs):
        e = BasicEvent(f"e{i}")
        e.expression = ConstantExpression(p)
        events.append(e)
    return events


def bdd_top(gate, **kw):
    tree = compile_gates([gate])
    tree.top_index = tree.gate_index[gate.id]
    bdd = build_bdd(tree, **kw)
    p = jnp.asarray(mean_basic_probabilities(tree))
    return float(bdd_probability(bdd, p)), tree, bdd


class TestForest:
    def test_reduction(self):
        forest = BddForest(2)
        x0, x1 = forest.var_node(0), forest.var_node(1)
        assert forest.and_(x0, x0) == x0
        assert forest.or_(x0, forest.not_(x0)) == 1
        assert forest.and_(x0, forest.not_(x0)) == 0
        assert forest.not_(forest.not_(x1)) == x1

    def test_unique_table(self):
        forest = BddForest(2)
        a = forest.and_(forest.var_node(0), forest.var_node(1))
        b = forest.and_(forest.var_node(1), forest.var_node(0))
        assert a == b


class TestExactness:
    def test_shared_event_dag(self):
        """The case where direct propagation is wrong: shared events."""
        a, b, c = make_events([0.1, 0.2, 0.3])
        g1 = Gate("g1")
        g1.formula = Formula(Connective.AND, [Arg(a), Arg(b)])
        g2 = Gate("g2")
        g2.formula = Formula(Connective.AND, [Arg(a), Arg(c)])
        top = Gate("top")
        top.formula = Formula(Connective.OR, [Arg(g1), Arg(g2)])
        got, _, _ = bdd_top(top)
        expected = brute_force_probability(top, [a, b, c])
        assert abs(got - expected) < 1e-14

    def test_random_shared_dags(self):
        """Random DAGs with heavy sharing: BDD == enumeration."""
        rng = np.random.default_rng(7)
        for trial in range(10):
            n = int(rng.integers(3, 8))
            events = make_events(rng.uniform(0.05, 0.9, n))
            gates = []
            for gi in range(int(rng.integers(2, 6))):
                pool = events + gates
                k = int(rng.integers(2, min(4, len(pool)) + 1))
                chosen = rng.choice(len(pool), size=k, replace=False)
                conn = [Connective.AND, Connective.OR, Connective.NOR,
                        Connective.NAND][int(rng.integers(0, 4))]
                gate = Gate(f"t{trial}g{gi}")
                args = [Arg(pool[int(i)], bool(rng.random() < 0.25))
                        for i in chosen]
                gate.formula = Formula(conn, args)
                gates.append(gate)
            top = Gate(f"t{trial}top")
            top.formula = Formula(
                Connective.OR,
                [Arg(gates[-1]), Arg(events[0])]) if len(gates) else None
            got, _, _ = bdd_top(top)
            expected = brute_force_probability(top, events)
            assert abs(got - expected) < 1e-12

    def test_atleast_shared(self):
        events = make_events([0.2, 0.3, 0.4, 0.5])
        inner = Gate("inner")
        inner.formula = Formula(Connective.ATLEAST,
                                [Arg(e) for e in events], min_number=2)
        top = Gate("top")
        top.formula = Formula(Connective.AND, [Arg(inner), Arg(events[0])])
        got, _, _ = bdd_top(top)
        expected = brute_force_probability(top, events)
        assert abs(got - expected) < 1e-14

    def test_cardinality(self):
        events = make_events([0.2, 0.3, 0.4])
        top = Gate("top")
        top.formula = Formula(Connective.CARDINALITY,
                              [Arg(e) for e in events],
                              min_number=1, max_number=2)
        got, _, _ = bdd_top(top)
        expected = brute_force_probability(top, events)
        assert abs(got - expected) < 1e-14

    def test_constant_roots(self):
        """A tautological structure reduces to the ONE terminal."""
        a, = make_events([0.4])
        g1 = Gate("g1")
        g1.formula = Formula(Connective.NULL, [Arg(a)])
        top2 = Gate("top2")
        top2.formula = Formula(Connective.IMPLY, [Arg(g1), Arg(a)])
        got, _, _ = bdd_top(top2)
        assert got == 1.0

    def test_ccf_beta_factor_exact(self):
        model = build_model("""<?xml version="1.0"?>
<opsa-mef>
  <define-fault-tree name="FT">
    <define-gate name="top">
      <and><basic-event name="p1"/><basic-event name="p2"/></and>
    </define-gate>
    <define-CCF-group name="pumps" model="beta-factor">
      <members>
        <basic-event name="p1"/><basic-event name="p2"/>
      </members>
      <distribution><float value="0.01"/></distribution>
      <factor level="2"><float value="0.2"/></factor>
    </define-CCF-group>
  </define-fault-tree>
</opsa-mef>""")
        tree = compile_fault_tree(model.fault_trees.get("FT"), use_ccf=True)
        bdd = build_bdd(tree)
        from canopy_tpu.compiler.expr_tape import ExpressionTape
        tape = ExpressionTape.build([e.expression for e in tree.basic_events])
        p = jnp.clip(tape.evaluate_mean(8760.0), 0, 1)
        got = float(bdd_probability(bdd, p))
        qi, qc = 0.8 * 0.01, 0.2 * 0.01
        expected = qc + (1 - qc) * qi * qi
        assert abs(got - expected) < 1e-14


class TestBatchingAndGrad:
    def test_trials_batch(self):
        a, b, c = make_events([0.1, 0.2, 0.3])
        g1 = Gate("g1")
        g1.formula = Formula(Connective.AND, [Arg(a), Arg(b)])
        top = Gate("top")
        top.formula = Formula(Connective.OR, [Arg(g1), Arg(c)])
        tree = compile_gates([top])
        tree.top_index = tree.gate_index[top.id]
        bdd = build_bdd(tree)
        batch = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (32, 3)))
        out = bdd_probability(bdd, batch)
        assert out.shape == (32,)
        single = float(bdd_probability(bdd, batch[5]))
        assert abs(float(out[5]) - single) < 1e-14

    def test_grad_exact_birnbaum(self):
        """Exact MIF on a shared-event DAG (where propagation grad isn't)."""
        a, b, c = make_events([0.1, 0.2, 0.3])
        g1 = Gate("g1")
        g1.formula = Formula(Connective.AND, [Arg(a), Arg(b)])
        g2 = Gate("g2")
        g2.formula = Formula(Connective.AND, [Arg(a), Arg(c)])
        top = Gate("top")
        top.formula = Formula(Connective.OR, [Arg(g1), Arg(g2)])
        tree = compile_gates([top])
        tree.top_index = tree.gate_index[top.id]
        bdd = build_bdd(tree)
        p = jnp.asarray(mean_basic_probabilities(tree))
        f = lambda q: bdd_probability(bdd, q)  # noqa: E731
        g = jax.grad(f)(p)
        for i in range(3):
            exact = float(f(p.at[i].set(1.0)) - f(p.at[i].set(0.0)))
            assert abs(float(g[i]) - exact) < 1e-12
