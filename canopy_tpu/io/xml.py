"""Strict XML ingestion for OpenPSA-MEF input files.

Capability parity with the reference XML IO layer
(``/root/reference/src/io/xml/{document,element,range,validator,helpers}.h``):

* :class:`Document` — parse a file with XInclude resolution, no network
  access, compaction for huge inputs, and optional RELAX NG validation
  (``document.h:15-33``).
* :class:`Element` — immutable adaptor over a DOM node with trimmed,
  *strictly typed* attribute/text access and name-filtered child iteration
  (``element.h:18-96``); every element knows its ``filename``/``line`` so
  model errors always carry source context.
* :class:`Validator` — compiled RELAX NG schema (``validator.h:12-20``).

Built on lxml (libxml2 underneath — the same engine the reference wraps),
which keeps parsing off the analysis hot path; model compilation and
quantification are the TPU-side costs.
"""

from __future__ import annotations

import re
from typing import Iterator

from lxml import etree

from ..errors import XIncludeError, XmlParseError, XmlValidityError

__all__ = ["Document", "Element", "Validator", "to_bool", "to_int", "to_float"]

_TRUE = {"true", "1"}
_FALSE = {"false", "0"}

# Strict number grammars: reject partial parses like "1.5x" or "" that
# Python's int()/float() plus stripping could otherwise let through oddly.
_INT_RE = re.compile(r"^[+-]?\d+$")
_FLOAT_RE = re.compile(
    r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def to_bool(text: str) -> bool:
    """Strict xs:boolean parse ('true'/'false'/'1'/'0')."""
    text = text.strip()
    if text in _TRUE:
        return True
    if text in _FALSE:
        return False
    raise ValueError(f"Failed to interpret value '{text}' as boolean.")


def to_int(text: str) -> int:
    """Strict integer parse (whole-string match only)."""
    text = text.strip()
    if not _INT_RE.match(text):
        raise ValueError(f"Failed to interpret value '{text}' as int.")
    return int(text)


def to_float(text: str) -> float:
    """Strict floating-point parse (whole-string match only)."""
    text = text.strip()
    if not _FLOAT_RE.match(text):
        raise ValueError(f"Failed to interpret value '{text}' as float.")
    return float(text)


_CONVERTERS = {bool: to_bool, int: to_int, float: to_float, str: lambda s: s.strip()}


class Element:
    """Immutable adaptor over an XML element node.

    Mirrors the access surface of the reference ``io::xml::element``:
    ``name``, ``filename``, ``line``, ``has_attribute``, ``attribute``
    (trimmed, optionally typed), ``text`` (typed), ``child``, ``children``
    (optionally name-filtered).
    """

    __slots__ = ("_node",)

    def __init__(self, node):
        self._node = node

    # -- identity ----------------------------------------------------------
    @property
    def name(self) -> str:
        return etree.QName(self._node).localname

    @property
    def filename(self) -> str:
        docinfo = self._node.getroottree().docinfo
        return docinfo.URL or "<memory>"

    @property
    def line(self) -> int:
        return self._node.sourceline or 0

    # -- attributes --------------------------------------------------------
    def has_attribute(self, name: str) -> bool:
        return name in self._node.attrib

    def attribute(self, name: str, type_=str, default=None):
        """Typed, trimmed attribute access.

        Returns ``default`` when the attribute is missing. Raises
        :class:`XmlValidityError` (with file:line) on a failed typed parse.
        """
        raw = self._node.get(name)
        if raw is None:
            return default
        try:
            return _CONVERTERS[type_](raw)
        except ValueError as exc:
            raise XmlValidityError(str(exc), filename=self.filename,
                                   line=self.line) from exc

    # -- text --------------------------------------------------------------
    def text(self, type_=str):
        raw = self._node.text or ""
        try:
            return _CONVERTERS[type_](raw)
        except ValueError as exc:
            raise XmlValidityError(str(exc), filename=self.filename,
                                   line=self.line) from exc

    # -- children ----------------------------------------------------------
    def child(self, name: str | None = None) -> "Element | None":
        """The first child element (optionally restricted by name)."""
        for node in self._node.iterchildren():
            if not isinstance(node.tag, str):
                continue  # skip comments / PIs
            if name is None or etree.QName(node).localname == name:
                return Element(node)
        return None

    def children(self, name: str | None = None) -> Iterator["Element"]:
        """Iterate child elements, skipping non-element nodes.

        Matches the reference ``range`` view semantics
        (``src/io/xml/range.h:11-69``): document order, elements only,
        optional name filter.
        """
        for node in self._node.iterchildren():
            if not isinstance(node.tag, str):
                continue
            if name is None or etree.QName(node).localname == name:
                yield Element(node)

    def num_children(self, name: str | None = None) -> int:
        return sum(1 for _ in self.children(name))

    def __repr__(self) -> str:  # pragma: no cover
        return f"<Element {self.name} at {self.filename}:{self.line}>"


class Validator:
    """Compiled RELAX NG schema validator (reference ``validator.h:12-20``)."""

    def __init__(self, schema_path: str):
        try:
            schema_doc = etree.parse(schema_path)
            self._schema = etree.RelaxNG(schema_doc)
        except (etree.XMLSyntaxError, etree.RelaxNGError) as exc:
            raise XmlParseError(f"Invalid RELAX NG schema: {exc}",
                                filename=schema_path) from exc

    def validate(self, document: "Document") -> None:
        if not self._schema.validate(document._tree):
            err = self._schema.error_log.last_error
            raise XmlValidityError(
                err.message if err else "Document failed RELAX NG validation.",
                filename=err.filename if err else document.filename,
                line=err.line if err else None)


class Document:
    """A parsed MEF input file: XInclude-resolved, optionally validated.

    Parser posture matches the reference (``document.cpp:8-35``): XInclude
    resolution, *no network access*, tolerant of huge inputs, with entity
    expansion disabled (hardening beyond the reference).
    """

    _PARSER = etree.XMLParser(
        huge_tree=True,
        no_network=True,
        resolve_entities=False,
        remove_comments=False,
        remove_pis=False,
    )

    def __init__(self, file_path: str, validator: Validator | None = None):
        try:
            self._tree = etree.parse(file_path, self._PARSER)
        except OSError as exc:
            raise XmlParseError(f"Cannot read input file: {exc}",
                                filename=file_path) from exc
        except etree.XMLSyntaxError as exc:
            raise XmlParseError(str(exc), filename=file_path,
                                line=exc.lineno) from exc
        try:
            self._tree.xinclude()
        except etree.XIncludeError as exc:
            raise XIncludeError(str(exc), filename=file_path) from exc
        if validator is not None:
            validator.validate(self)

    @classmethod
    def from_string(cls, text: str, filename: str = "<memory>",
                    validator: Validator | None = None) -> "Document":
        """Parse from an in-memory string (used heavily by tests)."""
        self = cls.__new__(cls)
        try:
            root = etree.fromstring(text.encode(), cls._PARSER)
            self._tree = root.getroottree()
        except etree.XMLSyntaxError as exc:
            raise XmlParseError(str(exc), filename=filename,
                                line=exc.lineno) from exc
        try:
            self._tree.xinclude()
        except etree.XIncludeError as exc:
            raise XIncludeError(str(exc), filename=filename) from exc
        if validator is not None:
            validator.validate(self)
        return self

    @property
    def filename(self) -> str:
        return self._tree.docinfo.URL or "<memory>"

    @property
    def root(self) -> Element:
        return Element(self._tree.getroot())
