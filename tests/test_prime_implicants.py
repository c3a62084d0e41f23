"""True prime implicants vs a brute-force oracle.

The oracle enumerates every product over <= n variables (3^n literal
assignments), keeps the implicants (the function is true on the whole
subcube), and filters to the prime ones (no literal removable).  The
BDD recursion (``compiler/prime_implicants.py``) must match exactly —
including consensus products that neither MOCUS-with-negations nor the
ZBDD minimal-solutions transform can produce.
"""

import itertools

import numpy as np
import pytest

from canopy_tpu.compiler.bdd import build_bdd
from canopy_tpu.compiler.graph import compile_gates
from canopy_tpu.compiler.prime_implicants import bdd_prime_implicants
from canopy_tpu.compiler.zbdd import bdd_minimal_cut_sets
from canopy_tpu.mef.event import Arg, BasicEvent, Connective, Formula, Gate
from canopy_tpu.mef.expr import ConstantExpression
from canopy_tpu.utils.synthetic import synthetic_mef_tree


def _events(n):
    out = []
    for i in range(n):
        e = BasicEvent(f"e{i}")
        e.expression = ConstantExpression(0.1)
        out.append(e)
    return out


def _compile(top):
    tree = compile_gates([top])
    tree.top_index = tree.gate_index[top.id]
    return tree


def _truth_table(tree):
    """Boolean function of the top over all 2^n basic assignments."""
    from canopy_tpu.engine.propagate import top_event_probability
    import jax.numpy as jnp

    n = tree.n_basic
    assignments = np.array(list(itertools.product([0.0, 1.0], repeat=n)))
    house = tree.house_state_vector()
    vals = np.asarray(top_event_probability(
        tree, jnp.asarray(assignments, jnp.float32),
        jnp.asarray(house)))
    return assignments.astype(bool), vals > 0.5


def brute_force_prime_implicants(tree):
    """All prime implicants by exhaustive subcube enumeration."""
    assignments, truth = _truth_table(tree)
    n = tree.n_basic

    def is_implicant(product):
        mask = np.ones(len(truth), dtype=bool)
        for slot, negated in product:
            col = assignments[:, slot]
            mask &= ~col if negated else col
        return mask.any() and truth[mask].all()

    implicants = []
    for choices in itertools.product((None, False, True), repeat=n):
        product = frozenset((slot, neg) for slot, neg in enumerate(choices)
                            if neg is not None)
        if is_implicant(product):
            implicants.append(product)
    primes = [p for p in implicants
              if not any(q < p for q in implicants)]
    return set(primes)


def _pi(tree, **kwargs):
    bdd = build_bdd(tree, house_states=np.asarray(
        tree.house_state_vector()))
    return bdd_prime_implicants(bdd, **kwargs)


class TestPrimeImplicants:
    def test_consensus_product_found(self):
        # f = (x and y) or (not x and z): primes are xy, !xz and the
        # consensus yz — the product every kept-negation MOCUS pass
        # misses (x never appears in it).
        x, y, z = _events(3)
        g1 = Gate("g1")
        g1.formula = Formula(Connective.AND, [Arg(x), Arg(y)])
        g2 = Gate("g2")
        g2.formula = Formula(Connective.AND, [Arg(x, True), Arg(z)])
        top = Gate("top")
        top.formula = Formula(Connective.OR, [Arg(g1), Arg(g2)])
        tree = _compile(top)
        got = set(_pi(tree))
        sx, sy, sz = (tree.basic_index[e.id] for e in (x, y, z))
        want = {frozenset({(sx, False), (sy, False)}),
                frozenset({(sx, True), (sz, False)}),
                frozenset({(sy, False), (sz, False)})}
        assert got == want
        assert got == brute_force_prime_implicants(tree)

    def test_xor_chain(self):
        a, b, c = _events(3)
        g = Gate("g")
        g.formula = Formula(Connective.XOR, [Arg(a), Arg(b)])
        top = Gate("top")
        top.formula = Formula(Connective.XOR, [Arg(g), Arg(c)])
        tree = _compile(top)
        assert set(_pi(tree)) == brute_force_prime_implicants(tree)

    @pytest.mark.parametrize("seed", [0, 3, 8, 13])
    def test_random_noncoherent_vs_brute_force(self, seed):
        top, _ = synthetic_mef_tree(n_basic=8, n_gates=10, fanin=3,
                                    seed=seed, atleast_fraction=0.2,
                                    complement_fraction=0.4)
        tree = _compile(top)
        assert set(_pi(tree)) == brute_force_prime_implicants(tree)

    def test_coherent_equals_minimal_cut_sets(self):
        top, _ = synthetic_mef_tree(n_basic=30, n_gates=25, fanin=3,
                                    seed=4, atleast_fraction=0.2,
                                    complement_fraction=0.0)
        tree = _compile(top)
        bdd = build_bdd(tree, house_states=np.asarray(
            tree.house_state_vector()))
        assert set(bdd_prime_implicants(bdd)) == \
            set(bdd_minimal_cut_sets(bdd))

    def test_python_forest_matches_native_choice(self):
        top, _ = synthetic_mef_tree(n_basic=12, n_gates=14, fanin=3,
                                    seed=2, atleast_fraction=0.2,
                                    complement_fraction=0.3)
        tree = _compile(top)
        bdd = build_bdd(tree, house_states=np.asarray(
            tree.house_state_vector()))
        auto = set(bdd_prime_implicants(bdd))
        python = set(bdd_prime_implicants(bdd, use_native=False))
        assert auto == python

    def test_limit_order_truncates_exactly(self):
        top, _ = synthetic_mef_tree(n_basic=8, n_gates=10, fanin=3,
                                    seed=8, atleast_fraction=0.2,
                                    complement_fraction=0.4)
        tree = _compile(top)
        full = set(_pi(tree))
        longest = max(len(p) for p in full)
        limit = max(1, longest - 1)
        got, truncated = _pi(tree, limit_order=limit, with_truncation=True)
        assert truncated
        assert set(got) == {p for p in full if len(p) <= limit}

    def test_constant_roots(self):
        a, = _events(1)
        inv = Gate("inv")
        inv.formula = Formula(Connective.NOT, [Arg(a)])
        top = Gate("top")
        top.formula = Formula(Connective.OR, [Arg(a), Arg(inv)])
        tree = _compile(top)
        assert _pi(tree) == [frozenset()]        # Tautology.
        a2, = _events(1)
        inv2 = Gate("inv")
        inv2.formula = Formula(Connective.NOT, [Arg(a2)])
        bottom = Gate("top")
        bottom.formula = Formula(Connective.AND, [Arg(a2), Arg(inv2)])
        tree0 = _compile(bottom)
        assert _pi(tree0) == []                  # Contradiction.


_CONSENSUS_XML = """<?xml version="1.0"?>
<opsa-mef>
  <define-fault-tree name="ft">
    <define-gate name="top">
      <or><gate name="g1"/><gate name="g2"/></or>
    </define-gate>
    <define-gate name="g1">
      <and><basic-event name="e0"/><basic-event name="e1"/></and>
    </define-gate>
    <define-gate name="g2">
      <and><not><basic-event name="e0"/></not>
           <basic-event name="e2"/></and>
    </define-gate>
    <define-basic-event name="e0"><float value="0.2"/></define-basic-event>
    <define-basic-event name="e1"><float value="0.3"/></define-basic-event>
    <define-basic-event name="e2"><float value="0.4"/></define-basic-event>
  </define-fault-tree>
</opsa-mef>
"""


class TestAnalysisDispatch:
    def test_prime_implicant_mode_uses_bdd(self, tmp_path):
        from canopy_tpu.engine.analysis import RiskAnalysis
        from canopy_tpu.mef.initializer import Initializer
        from canopy_tpu.settings import Settings

        path = tmp_path / "consensus.xml"
        path.write_text(_CONSENSUS_XML)
        settings = (Settings().algorithm("bdd").prime_implicants(True)
                    .probability_analysis(True))
        model = Initializer([str(path)], settings).model
        report = RiskAnalysis(model, settings).run()
        ft_result = report.fault_trees[0]
        names = [set(literals) for _o, _p, literals in ft_result.products]
        # The consensus product e1·e2 appears; e0 is absent from it —
        # the kept-negation MOCUS stand-in could never produce it.
        assert {"e1", "e2"} in names
        assert {"e0", "e1"} in names
        assert {"not e0", "e2"} in names
        assert ft_result.n_products == 3
        # Exact probability: P = P(e0)P(e1) + P(!e0)P(e2).
        assert ft_result.probability == pytest.approx(
            0.2 * 0.3 + 0.8 * 0.4, rel=1e-12)
