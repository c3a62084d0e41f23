"""Event-tree validation battery + Link end-to-end tests."""

import pytest

from canopy_tpu.errors import CycleError, ValidityError
from canopy_tpu.engine.analysis import RiskAnalysis
from canopy_tpu.settings import Settings

from helpers import build_model


def wrap(body):
    return f'<?xml version="1.0"?>\n<opsa-mef>{body}</opsa-mef>'


FT = """
  <define-fault-tree name="FT">
    <define-gate name="g"><basic-event name="e"/></define-gate>
    <define-basic-event name="e"><float value="0.2"/></define-basic-event>
  </define-fault-tree>
"""


class TestFunctionalEventOrder:
    def test_out_of_order_forks_rejected(self):
        xml = wrap("""
  <define-event-tree name="ET">
    <define-functional-event name="F1"/>
    <define-functional-event name="F2"/>
    <define-sequence name="S"/>
    <initial-state>
      <fork functional-event="F2">
        <path state="a">
          <fork functional-event="F1">
            <path state="x"><sequence name="S"/></path>
          </fork>
        </path>
      </fork>
    </initial-state>
  </define-event-tree>
  <define-initiating-event name="I" event-tree="ET"/>
""" + FT)
        with pytest.raises(ValidityError):
            build_model(xml, Settings())

    def test_in_order_accepted(self):
        xml = wrap("""
  <define-event-tree name="ET">
    <define-functional-event name="F1"/>
    <define-functional-event name="F2"/>
    <define-sequence name="S"/>
    <initial-state>
      <fork functional-event="F1">
        <path state="a">
          <fork functional-event="F2">
            <path state="x"><sequence name="S"/></path>
          </fork>
        </path>
      </fork>
    </initial-state>
  </define-event-tree>
  <define-initiating-event name="I" event-tree="ET"/>
""" + FT)
        build_model(xml, Settings())


class TestLinks:
    TWO_TREES = """
  <define-event-tree name="Primary">
    <define-sequence name="handoff">
      <event-tree name="Secondary"/>
    </define-sequence>
    <initial-state>
      <collect-expression><float value="0.5"/></collect-expression>
      <sequence name="handoff"/>
    </initial-state>
  </define-event-tree>
  <define-event-tree name="Secondary">
    <define-sequence name="good"/>
    <define-sequence name="bad"/>
    <define-functional-event name="Fix"/>
    <initial-state>
      <fork functional-event="Fix">
        <path state="works">
          <collect-expression><float value="0.9"/></collect-expression>
          <sequence name="good"/>
        </path>
        <path state="fails">
          <collect-expression><float value="0.1"/></collect-expression>
          <sequence name="bad"/>
        </path>
      </fork>
    </initial-state>
  </define-event-tree>
  <define-initiating-event name="I" event-tree="Primary"/>
"""

    def test_link_walk_end_to_end(self):
        model = build_model(wrap(self.TWO_TREES), Settings())
        settings = Settings().probability_analysis(True)
        report = RiskAnalysis(model, settings).run()
        by_name = {s.sequence: s for s in report.sequences}
        assert set(by_name) == {"good", "bad"}
        assert by_name["good"].probability == pytest.approx(0.45)
        assert by_name["bad"].probability == pytest.approx(0.05)
        assert by_name["good"].linked_trees == ["Secondary"]

    def test_link_outside_sequence_rejected(self):
        xml = wrap("""
  <define-event-tree name="A">
    <define-sequence name="S"/>
    <initial-state>
      <event-tree name="B"/>
      <sequence name="S"/>
    </initial-state>
  </define-event-tree>
  <define-event-tree name="B">
    <define-sequence name="T"/>
    <initial-state><sequence name="T"/></initial-state>
  </define-event-tree>
""")
        with pytest.raises(ValidityError):
            build_model(xml, Settings())

    def test_link_cycle_rejected(self):
        xml = wrap("""
  <define-event-tree name="A">
    <define-sequence name="SA"><event-tree name="B"/></define-sequence>
    <initial-state><sequence name="SA"/></initial-state>
  </define-event-tree>
  <define-event-tree name="B">
    <define-sequence name="SB"><event-tree name="A"/></define-sequence>
    <initial-state><sequence name="SB"/></initial-state>
  </define-event-tree>
""")
        with pytest.raises(CycleError):
            build_model(xml, Settings())


class TestSubstitutionValidation:
    def test_declared_type_mismatch(self):
        xml = wrap(FT + """
  <define-fault-tree name="FT2">
    <define-gate name="g2">
      <and><basic-event name="a"/><basic-event name="b"/></and>
    </define-gate>
    <define-basic-event name="a"><float value="0.1"/></define-basic-event>
    <define-basic-event name="b"><float value="0.1"/></define-basic-event>
  </define-fault-tree>
  <define-substitution name="sub" type="exchange-event">
    <hypothesis>
      <and><basic-event name="a"/><basic-event name="b"/></and>
    </hypothesis>
    <target><constant value="false"/></target>
  </define-substitution>
""")
        with pytest.raises(ValidityError):
            build_model(xml, Settings())

    def test_delete_terms_deduced(self):
        xml = wrap(FT + """
  <define-fault-tree name="FT2">
    <define-gate name="g2">
      <and><basic-event name="a"/><basic-event name="b"/></and>
    </define-gate>
    <define-basic-event name="a"><float value="0.1"/></define-basic-event>
    <define-basic-event name="b"><float value="0.1"/></define-basic-event>
  </define-fault-tree>
  <define-substitution name="sub" type="delete-terms">
    <hypothesis>
      <and><basic-event name="a"/><basic-event name="b"/></and>
    </hypothesis>
    <target><constant value="false"/></target>
  </define-substitution>
""")
        model = build_model(xml, Settings())
        assert model.substitutions.get("sub").type() == 0

    def test_complement_hypothesis_rejected(self):
        xml = wrap(FT + """
  <define-substitution name="sub">
    <hypothesis>
      <and><not><basic-event name="e"/></not><basic-event name="e2"/></and>
    </hypothesis>
    <target><constant value="false"/></target>
  </define-substitution>
  <model-data>
    <define-basic-event name="e2"><float value="0.1"/></define-basic-event>
  </model-data>
""")
        with pytest.raises(ValidityError):
            build_model(xml, Settings())


class TestAlignmentValidation:
    def test_fractions_must_sum_to_one(self):
        xml = wrap(FT + """
  <define-alignment name="ops">
    <define-phase name="p1" time-fraction="0.5"/>
    <define-phase name="p2" time-fraction="0.3"/>
  </define-alignment>
""")
        with pytest.raises(ValidityError):
            build_model(xml, Settings())

    def test_fraction_range(self):
        xml = wrap(FT + """
  <define-alignment name="ops">
    <define-phase name="p1" time-fraction="1.5"/>
  </define-alignment>
""")
        with pytest.raises(ValidityError):
            build_model(xml, Settings())


class TestCcfXmlValidation:
    def test_factor_redefinition(self):
        xml = wrap("""
  <define-fault-tree name="FT">
    <define-gate name="g">
      <and><basic-event name="m1"/><basic-event name="m2"/></and>
    </define-gate>
    <define-CCF-group name="grp" model="MGL">
      <members>
        <basic-event name="m1"/><basic-event name="m2"/>
        <basic-event name="m3"/>
      </members>
      <distribution><float value="0.01"/></distribution>
      <factor level="2"><float value="0.1"/></factor>
      <factor level="2"><float value="0.2"/></factor>
    </define-CCF-group>
  </define-fault-tree>
""")
        with pytest.raises(ValidityError):
            build_model(xml, Settings())


class TestCardinalityXml:
    def test_cardinality_gate_parses_and_quantifies(self):
        import jax.numpy as jnp
        from canopy_tpu.compiler.graph import compile_fault_tree
        from canopy_tpu.engine.propagate import (
            mean_basic_probabilities, top_event_probability)
        model = build_model(wrap("""
  <define-fault-tree name="FT">
    <define-gate name="top">
      <cardinality min="1" max="2">
        <basic-event name="x"/><basic-event name="y"/>
        <basic-event name="z"/>
      </cardinality>
    </define-gate>
    <define-basic-event name="x"><float value="0.3"/></define-basic-event>
    <define-basic-event name="y"><float value="0.4"/></define-basic-event>
    <define-basic-event name="z"><float value="0.5"/></define-basic-event>
  </define-fault-tree>
"""))
        tree = compile_fault_tree(model.fault_trees.get("FT"))
        got = float(top_event_probability(
            tree, jnp.asarray(mean_basic_probabilities(tree))))
        from helpers import brute_force_probability
        top = model.gates.get("top")
        expected = brute_force_probability(
            top, list(model.basic_events))
        assert abs(got - expected) < 1e-12
