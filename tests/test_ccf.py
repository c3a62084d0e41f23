"""CCF group tests: factor rules, model math, expansion (ccf_group.h)."""

import itertools
import math

import jax.numpy as jnp
import pytest

from canopy_tpu.errors import LogicError, ValidityError
from canopy_tpu.compiler.graph import compile_fault_tree
from canopy_tpu.engine.propagate import top_event_probability
from canopy_tpu.mef.ccf_group import (AlphaFactorModel, BetaFactorModel,
                                      MglModel, PhiFactorModel)
from canopy_tpu.mef.event import BasicEvent
from canopy_tpu.mef.expr import ConstantExpression

from helpers import build_model

C = ConstantExpression


def make_group(cls, n_members=3, name="ccf"):
    group = cls(name)
    for i in range(n_members):
        group.add_member(BasicEvent(f"m{i}"))
    return group


class TestFactorRules:
    def test_level_bounds(self):
        group = make_group(MglModel)
        with pytest.raises(ValidityError):
            group.add_factor(C(0.1), level=1)   # < min_level (2) for MGL
        with pytest.raises(ValidityError):
            group.add_factor(C(0.1), level=4)   # > num members
        group.add_factor(C(0.1), level=2)
        with pytest.raises(ValidityError):
            group.add_factor(C(0.2), level=2)   # redefinition

    def test_factor_without_members(self):
        group = BetaFactorModel("empty")
        with pytest.raises(LogicError):
            group.add_factor(C(0.1), level=1)

    def test_duplicate_member(self):
        group = make_group(BetaFactorModel)
        with pytest.raises(ValidityError):
            group.add_member(BasicEvent("m0"))

    def test_member_with_expression_rejected(self):
        group = make_group(BetaFactorModel)
        event = BasicEvent("withp")
        event.expression = C(0.5)
        with pytest.raises(ValidityError):
            group.add_member(event)

    def test_distribution_validation(self):
        group = make_group(BetaFactorModel)
        group.add_distribution(C(0.01))
        group.add_factor(C(0.2), level=3)
        group.validate()

    def test_phi_factors_must_sum_to_one(self):
        group = make_group(PhiFactorModel)
        group.add_distribution(C(0.01))
        group.add_factor(C(0.5), level=1)
        group.add_factor(C(0.3), level=2)
        group.add_factor(C(0.1), level=3)  # sums to 0.9
        with pytest.raises(ValidityError):
            group.validate()


class TestModelMath:
    def test_beta_factor(self):
        group = make_group(BetaFactorModel, 3)
        q, beta = 0.01, 0.2
        group.add_distribution(C(q))
        group.add_factor(C(beta), level=3)
        probs = dict(group.calculate_probabilities())
        assert abs(probs[1].value() - (1 - beta) * q) < 1e-15
        assert abs(probs[3].value() - beta * q) < 1e-15

    def test_mgl(self):
        group = make_group(MglModel, 3)
        q, beta, gamma = 0.01, 0.2, 0.5
        group.add_distribution(C(q))
        group.add_factor(C(beta), level=2)
        group.add_factor(C(gamma), level=3)
        probs = dict(group.calculate_probabilities())
        # Q1 = (1-beta) Q; Q2 = 1/C(2,1) beta (1-gamma) Q; Q3 = 1/C(2,2) beta gamma Q
        assert abs(probs[1].value() - (1 - beta) * q) < 1e-15
        assert abs(probs[2].value() - 0.5 * beta * (1 - gamma) * q) < 1e-15
        assert abs(probs[3].value() - beta * gamma * q) < 1e-15

    def test_alpha_factor(self):
        group = make_group(AlphaFactorModel, 3)
        q = 0.01
        a1, a2, a3 = 0.9, 0.07, 0.03
        group.add_distribution(C(q))
        group.add_factor(C(a1), level=1)
        group.add_factor(C(a2), level=2)
        group.add_factor(C(a3), level=3)
        probs = dict(group.calculate_probabilities())
        total = 1 * a1 + 2 * a2 + 3 * a3
        for k, alpha in ((1, a1), (2, a2), (3, a3)):
            expected = k / math.comb(2, k - 1) * alpha / total * q
            assert abs(probs[k].value() - expected) < 1e-15

    def test_phi_factor(self):
        group = make_group(PhiFactorModel, 3)
        q = 0.01
        group.add_distribution(C(q))
        for level, phi in ((1, 0.6), (2, 0.3), (3, 0.1)):
            group.add_factor(C(phi), level=level)
        group.validate()
        probs = dict(group.calculate_probabilities())
        assert abs(probs[2].value() - 0.3 * q) < 1e-15


class TestExpansion:
    def test_apply_model_structure(self):
        group = make_group(MglModel, 3)
        group.add_distribution(C(0.01))
        group.add_factor(C(0.2), level=2)
        group.add_factor(C(0.5), level=3)
        group.apply_model()
        # 3 singles + 3 pairs + 1 triple = 7 CCF events.
        assert len(group.ccf_events) == 7
        for member in group.members:
            assert member.has_ccf
            # Each member's proxy OR gate has 1 + 2 + 1 = 4 args.
            assert len(member.ccf_gate.formula.args) == 4

    def test_end_to_end_beta_factor(self):
        """CCF expansion through XML -> quantification (2-member beta)."""
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
        from canopy_tpu.compiler.bdd import build_bdd
        from canopy_tpu.compiler.expr_tape import ExpressionTape
        from canopy_tpu.engine.bdd_eval import bdd_probability
        tape = ExpressionTape.build([e.expression for e in tree.basic_events])
        p = jnp.clip(tape.evaluate_mean(8760.0), 0, 1)
        # Shared CCF events demand the exact (BDD) engine: direct
        # propagation assumes argument independence.
        got = float(bdd_probability(build_bdd(tree), p))
        qi = 0.8 * 0.01   # independent part: (1-beta) Q
        qc = 0.2 * 0.01   # common part: beta Q
        expected = qc + (1 - qc) * qi * qi
        assert abs(got - expected) < 1e-12

    def test_ccf_ignored_without_flag(self):
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
        tree = compile_fault_tree(model.fault_trees.get("FT"), use_ccf=False)
        assert tree.n_gates == 1
        assert tree.n_basic == 2


class TestCcfAnalysisToggle:
    def test_model_with_ccf_groups_analyzed_without_ccf_setting(self):
        """A CCF-bearing model must analyze cleanly with ccf_analysis
        OFF (the proxy gates are simply not expanded); previously the
        BDD/modules/cutsets paths dereferenced the absent proxy gate
        (KeyError)."""
        import os
        from canopy_tpu.engine.analysis import RiskAnalysis
        from canopy_tpu.mef import Initializer
        from canopy_tpu.settings import Settings
        fx = os.path.join(os.path.dirname(__file__), "fixtures",
                          "aralia_like_ccf.xml")
        off = Settings().probability_analysis(True)
        r_off = RiskAnalysis(Initializer([fx], off).model, off).run()
        on = Settings().probability_analysis(True).ccf_analysis(True)
        r_on = RiskAnalysis(Initializer([fx], on).model, on).run()
        p_off = r_off.fault_trees[0].probability
        p_on = r_on.fault_trees[0].probability
        assert p_off is not None and p_on is not None
        # CCF coupling changes the result; both paths must be finite.
        assert p_off != p_on
