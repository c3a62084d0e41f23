"""Initializer tests: registration, scoping, cycles, validation battery."""

import pytest

from canopy_tpu.errors import (CycleError, DuplicateElementError,
                               IllegalOperation, UndefinedElement,
                               ValidityError)
from canopy_tpu.io.xml import Document
from canopy_tpu.mef import Initializer
from canopy_tpu.mef.event import Connective
from canopy_tpu.settings import Settings

from helpers import build_model

MINIMAL = """<?xml version="1.0"?>
<opsa-mef>
  <define-fault-tree name="FT">
    <define-gate name="top">
      <and><basic-event name="e1"/><basic-event name="e2"/></and>
    </define-gate>
    <define-basic-event name="e1"><float value="0.1"/></define-basic-event>
    <define-basic-event name="e2"><float value="0.2"/></define-basic-event>
  </define-fault-tree>
</opsa-mef>"""


class TestBasics:
    def test_minimal_model(self):
        model = build_model(MINIMAL)
        assert len(model.basic_events) == 2
        assert len(model.gates) == 1
        ft = model.fault_trees.get("FT")
        assert [g.name for g in ft.top_events] == ["top"]
        assert model.gates.get("top").formula.connective is Connective.AND

    def test_forward_references(self):
        """Gates may reference constructs defined later (TBD worklist)."""
        model = build_model("""<?xml version="1.0"?>
<opsa-mef>
  <define-fault-tree name="FT">
    <define-gate name="top">
      <or><gate name="later"/><basic-event name="e"/></or>
    </define-gate>
    <define-gate name="later">
      <basic-event name="e2"/>
    </define-gate>
    <define-basic-event name="e"><float value="0.5"/></define-basic-event>
    <define-basic-event name="e2"><float value="0.5"/></define-basic-event>
  </define-fault-tree>
</opsa-mef>""")
        assert "later" in model.gates

    def test_undefined_event(self):
        with pytest.raises(UndefinedElement):
            build_model("""<?xml version="1.0"?>
<opsa-mef>
  <define-fault-tree name="FT">
    <define-gate name="top"><gate name="ghost"/></define-gate>
  </define-fault-tree>
</opsa-mef>""")

    def test_duplicate_event_across_types(self):
        """One id namespace across gates/basic/house events (model.h:151)."""
        with pytest.raises(DuplicateElementError):
            build_model("""<?xml version="1.0"?>
<opsa-mef>
  <define-fault-tree name="FT">
    <define-gate name="x"><basic-event name="e"/></define-gate>
    <define-basic-event name="x"><float value="0.1"/></define-basic-event>
    <define-basic-event name="e"><float value="0.1"/></define-basic-event>
  </define-fault-tree>
</opsa-mef>""")

    def test_missing_expression_with_probability(self):
        with pytest.raises(ValidityError):
            build_model("""<?xml version="1.0"?>
<opsa-mef>
  <define-fault-tree name="FT">
    <define-gate name="top"><basic-event name="e"/></define-gate>
    <define-basic-event name="e"/>
  </define-fault-tree>
</opsa-mef>""")

    def test_missing_expression_without_probability(self):
        model = build_model("""<?xml version="1.0"?>
<opsa-mef>
  <define-fault-tree name="FT">
    <define-gate name="top"><basic-event name="e"/></define-gate>
    <define-basic-event name="e"/>
  </define-fault-tree>
</opsa-mef>""", Settings())
        assert not model.basic_events.get("e").has_expression

    def test_error_carries_source_line(self):
        try:
            build_model("""<?xml version="1.0"?>
<opsa-mef>
  <define-fault-tree name="FT">
    <define-gate name="top"><gate name="ghost"/></define-gate>
  </define-fault-tree>
</opsa-mef>""")
            raise AssertionError("expected UndefinedElement")
        except UndefinedElement as err:
            assert err.line is not None

    def test_model_data_section(self):
        model = build_model("""<?xml version="1.0"?>
<opsa-mef>
  <define-fault-tree name="FT">
    <define-gate name="top"><basic-event name="e"/></define-gate>
  </define-fault-tree>
  <model-data>
    <define-basic-event name="e"><float value="0.25"/></define-basic-event>
    <define-house-event name="h"><constant value="true"/></define-house-event>
    <define-parameter name="p"><float value="3.0"/></define-parameter>
  </model-data>
</opsa-mef>""")
        assert model.basic_events.get("e").p() == 0.25
        assert model.house_events.get("h").state is True
        assert model.parameters.get("p").value() == 3.0

    def test_label_and_attributes(self):
        model = build_model("""<?xml version="1.0"?>
<opsa-mef name="m">
  <define-fault-tree name="FT">
    <define-gate name="top">
      <label>The top event</label>
      <attributes><attribute name="flavor" value="demo"/></attributes>
      <basic-event name="e"/>
    </define-gate>
    <define-basic-event name="e"><float value="0.1"/></define-basic-event>
  </define-fault-tree>
</opsa-mef>""")
        top = model.gates.get("top")
        assert top.label == "The top event"
        assert top.get_attribute("flavor").value == "demo"
        assert model.name == "m"


class TestParametersAndScoping:
    def test_parameter_reference(self):
        model = build_model("""<?xml version="1.0"?>
<opsa-mef>
  <define-fault-tree name="FT">
    <define-gate name="top"><basic-event name="e"/></define-gate>
    <define-basic-event name="e">
      <exponential><parameter name="lam"/><system-mission-time/></exponential>
    </define-basic-event>
    <define-parameter name="lam"><float value="1e-4"/></define-parameter>
  </define-fault-tree>
</opsa-mef>""", Settings().probability_analysis(True).mission_time(1000.0))
        import math
        expected = 1 - math.exp(-1e-4 * 1000.0)
        assert abs(model.basic_events.get("e").p() - expected) < 1e-12

    def test_private_role_scoping(self):
        model = build_model("""<?xml version="1.0"?>
<opsa-mef>
  <define-fault-tree name="FT" role="private">
    <define-gate name="top" role="public">
      <and>
        <basic-event name="local"/>
        <basic-event name="FT.sub.inner"/>
      </and>
    </define-gate>
    <define-basic-event name="local" role="private">
      <float value="0.1"/>
    </define-basic-event>
    <define-component name="sub" role="private">
      <define-basic-event name="inner"><float value="0.2"/></define-basic-event>
    </define-component>
  </define-fault-tree>
</opsa-mef>""")
        assert "FT.local" in model.basic_events
        assert "FT.sub.inner" in model.basic_events

    def test_parameter_unit_mismatch(self):
        with pytest.raises(ValidityError):
            build_model("""<?xml version="1.0"?>
<opsa-mef>
  <define-fault-tree name="FT">
    <define-gate name="top"><basic-event name="e"/></define-gate>
    <define-basic-event name="e">
      <exponential><parameter name="lam" unit="hours"/>
        <system-mission-time/></exponential>
    </define-basic-event>
    <define-parameter name="lam" unit="hours-1">
      <float value="1e-4"/>
    </define-parameter>
  </define-fault-tree>
</opsa-mef>""")

    def test_parameter_cycle(self):
        with pytest.raises(CycleError):
            build_model("""<?xml version="1.0"?>
<opsa-mef>
  <define-fault-tree name="FT">
    <define-gate name="top"><basic-event name="e"/></define-gate>
    <define-basic-event name="e"><parameter name="a"/></define-basic-event>
    <define-parameter name="a"><parameter name="b"/></define-parameter>
    <define-parameter name="b"><parameter name="a"/></define-parameter>
  </define-fault-tree>
</opsa-mef>""")


class TestCycles:
    def test_gate_cycle(self):
        with pytest.raises(CycleError):
            build_model("""<?xml version="1.0"?>
<opsa-mef>
  <define-fault-tree name="FT">
    <define-gate name="a"><gate name="b"/></define-gate>
    <define-gate name="b"><gate name="a"/></define-gate>
  </define-fault-tree>
</opsa-mef>""", Settings())

    def test_self_cycle(self):
        with pytest.raises(CycleError):
            build_model("""<?xml version="1.0"?>
<opsa-mef>
  <define-fault-tree name="FT">
    <define-gate name="a"><or><gate name="a"/><basic-event name="e"/></or>
    </define-gate>
    <define-basic-event name="e"><float value="0.1"/></define-basic-event>
  </define-fault-tree>
</opsa-mef>""", Settings())


class TestHouseEvents:
    def test_house_event_state(self):
        model = build_model("""<?xml version="1.0"?>
<opsa-mef>
  <define-fault-tree name="FT">
    <define-gate name="top">
      <and><house-event name="h"/><basic-event name="e"/></and>
    </define-gate>
    <define-house-event name="h"><constant value="true"/></define-house-event>
    <define-basic-event name="e"><float value="0.5"/></define-basic-event>
  </define-fault-tree>
</opsa-mef>""")
        assert model.house_events.get("h").state is True

    def test_house_event_default_false(self):
        model = build_model("""<?xml version="1.0"?>
<opsa-mef>
  <define-fault-tree name="FT">
    <define-gate name="top">
      <and><house-event name="h"/><basic-event name="e"/></and>
    </define-gate>
    <define-house-event name="h"/>
    <define-basic-event name="e"><float value="0.5"/></define-basic-event>
  </define-fault-tree>
</opsa-mef>""")
        assert model.house_events.get("h").state is False


class TestExtern:
    def test_extern_disallowed_by_default(self):
        with pytest.raises(IllegalOperation):
            build_model("""<?xml version="1.0"?>
<opsa-mef>
  <define-extern-library name="lib" path="libm.so.6" system="true"/>
</opsa-mef>""")


class TestWildcards:
    def test_glob_expansion(self, tmp_path):
        for i, xml in enumerate([MINIMAL]):
            (tmp_path / f"model{i}.xml").write_text(xml)
        init = Initializer([str(tmp_path / "model*.xml")],
                           Settings().probability_analysis(True))
        assert "FT" in init.model.fault_trees

    def test_missing_file(self):
        from canopy_tpu.errors import IOError_
        with pytest.raises(IOError_):
            Initializer(["/nonexistent/input.xml"], Settings())

    def test_duplicate_file(self, tmp_path):
        from canopy_tpu.errors import IOError_
        f = tmp_path / "m.xml"
        f.write_text(MINIMAL)
        with pytest.raises(IOError_):
            Initializer([str(f), str(f)], Settings())
