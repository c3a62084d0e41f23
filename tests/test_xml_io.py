"""XML IO layer tests (strict typed parsing, file:line context)."""

import pytest

from canopy_tpu.errors import XmlParseError, XmlValidityError
from canopy_tpu.io.xml import Document, to_bool, to_float, to_int


class TestTypedParsing:
    def test_bool(self):
        assert to_bool("true") is True
        assert to_bool(" 1 ") is True
        assert to_bool("false") is False
        assert to_bool("0") is False
        with pytest.raises(ValueError):
            to_bool("yes")

    def test_int_strict(self):
        assert to_int("42") == 42
        assert to_int(" -7 ") == -7
        for bad in ("1.5", "4x", "", "0x10"):
            with pytest.raises(ValueError):
                to_int(bad)

    def test_float_strict(self):
        assert to_float("1.5e-3") == 1.5e-3
        assert to_float(".5") == 0.5
        for bad in ("1.5x", "", "nan-ish"):
            with pytest.raises(ValueError):
                to_float(bad)


class TestDocument:
    def test_parse_and_navigate(self):
        doc = Document.from_string(
            "<root><a x=' 3 '/><b>text</b><!-- comment --><a x='4'/></root>")
        root = doc.root
        assert root.name == "root"
        assert [c.name for c in root.children()] == ["a", "b", "a"]
        assert [c.name for c in root.children("a")] == ["a", "a"]
        assert root.child("b").text() == "text"
        assert root.child("a").attribute("x", int) == 3

    def test_malformed_raises(self):
        with pytest.raises(XmlParseError):
            Document.from_string("<root><unclosed></root>")

    def test_bad_typed_attribute_carries_line(self):
        doc = Document.from_string("<root>\n<a x='notanint'/></root>")
        with pytest.raises(XmlValidityError) as err:
            doc.root.child("a").attribute("x", int)
        assert err.value.line == 2

    def test_missing_attribute_default(self):
        doc = Document.from_string("<root/>")
        assert doc.root.attribute("nope") is None
        assert doc.root.attribute("nope", int, 7) == 7

    def test_line_numbers(self):
        doc = Document.from_string("<root>\n  <child/>\n</root>")
        assert doc.root.child("child").line == 2

    def test_xinclude(self, tmp_path):
        inner = tmp_path / "inner.xml"
        inner.write_text("<inner val='5'/>")
        outer = tmp_path / "outer.xml"
        outer.write_text(
            "<root xmlns:xi='http://www.w3.org/2001/XInclude'>"
            f"<xi:include href='inner.xml'/></root>")
        doc = Document(str(outer))
        assert doc.root.child("inner").attribute("val", int) == 5
