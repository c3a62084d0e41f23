"""Element-core machinery tests (reference element.h semantics)."""

import pytest

from canopy_tpu.errors import (DuplicateElementError, UndefinedElement,
                               ValidityError)
from canopy_tpu.io.xml import Document
from canopy_tpu.mef import Initializer
from canopy_tpu.mef.element import (Attribute, Element, RoleSpecifier,
                                    Table, check_name)
from canopy_tpu.settings import Settings

from helpers import build_model


class TestNames:
    def test_no_dots(self):
        with pytest.raises(ValidityError):
            check_name("a.b")
        with pytest.raises(ValidityError):
            check_name("")
        assert check_name("ok-name_1") == "ok-name_1"


class TestIdentity:
    def test_public_id_is_name(self):
        e = Element("pump", "sys", RoleSpecifier.PUBLIC)
        assert e.id == "pump"
        assert e.full_path == "sys.pump"

    def test_private_id_is_full_path(self):
        e = Element("pump", "sys", RoleSpecifier.PRIVATE)
        assert e.id == "sys.pump"


class TestAttributes:
    def test_inheritance_from_container(self):
        parent = Element("parent")
        child = Element("child")
        child.container = parent
        parent.set_attribute(Attribute("flavor", "salty"))
        assert child.get_attribute("flavor").value == "salty"
        child.set_attribute(Attribute("flavor", "sweet"))
        assert child.get_attribute("flavor").value == "sweet"

    def test_duplicate_attribute(self):
        e = Element("x")
        e.set_attribute(Attribute("a", "1"))
        with pytest.raises(DuplicateElementError):
            e.set_attribute(Attribute("a", "2"))

    def test_remove_attribute(self):
        from canopy_tpu.errors import LogicError
        e = Element("x")
        e.set_attribute(Attribute("a", "1"))
        assert e.remove_attribute("a").value == "1"
        with pytest.raises(LogicError):
            e.remove_attribute("a")


class TestTable:
    def test_add_get_remove_extract(self):
        table = Table("widget")
        a = Element("a")
        table.add(a)
        assert table.get("a") is a
        assert "a" in table
        with pytest.raises(DuplicateElementError):
            table.add(Element("a"))
        assert table.extract("a") is a
        with pytest.raises(UndefinedElement):
            table.get("a")

    def test_find_returns_none(self):
        assert Table("w").find("missing") is None


class TestMultiFileModels:
    def test_model_split_across_documents(self):
        """One model built from several input documents (initializer
        keeps a single Model across files)."""
        doc1 = Document.from_string("""<?xml version="1.0"?>
<opsa-mef name="split">
  <define-fault-tree name="FT">
    <define-gate name="top">
      <and><basic-event name="e1"/><basic-event name="e2"/></and>
    </define-gate>
  </define-fault-tree>
</opsa-mef>""")
        doc2 = Document.from_string("""<?xml version="1.0"?>
<opsa-mef>
  <model-data>
    <define-basic-event name="e1"><float value="0.1"/></define-basic-event>
    <define-basic-event name="e2"><float value="0.2"/></define-basic-event>
  </model-data>
</opsa-mef>""")
        init = Initializer.from_documents(
            [doc1, doc2], Settings().probability_analysis(True))
        assert init.model.name == "split"
        assert init.model.basic_events.get("e1").p() == 0.1

    def test_cross_file_references(self):
        """A gate in file 1 references a gate defined in file 2."""
        doc1 = Document.from_string("""<?xml version="1.0"?>
<opsa-mef>
  <define-fault-tree name="A">
    <define-gate name="top">
      <or><gate name="other"/><basic-event name="e"/></or>
    </define-gate>
    <define-basic-event name="e"><float value="0.3"/></define-basic-event>
  </define-fault-tree>
</opsa-mef>""")
        doc2 = Document.from_string("""<?xml version="1.0"?>
<opsa-mef>
  <define-fault-tree name="B">
    <define-gate name="other"><basic-event name="e2"/></define-gate>
    <define-basic-event name="e2"><float value="0.4"/></define-basic-event>
  </define-fault-tree>
</opsa-mef>""")
        init = Initializer.from_documents(
            [doc1, doc2], Settings().probability_analysis(True))
        assert "other" in init.model.gates
        tree_a = init.model.fault_trees.get("A")
        assert [g.name for g in tree_a.top_events] == ["top"]


class TestModelNamespace:
    def test_get_event_cross_type(self):
        model = build_model("""<?xml version="1.0"?>
<opsa-mef>
  <define-fault-tree name="FT">
    <define-gate name="g"><basic-event name="b"/></define-gate>
    <define-basic-event name="b"><float value="0.1"/></define-basic-event>
    <define-house-event name="h"/>
  </define-fault-tree>
</opsa-mef>""")
        assert model.get_event("g").kind == "gate"
        assert model.get_event("b").kind == "basic event"
        assert model.get_event("h").kind == "house event"
        with pytest.raises(UndefinedElement):
            model.get_event("nope")
