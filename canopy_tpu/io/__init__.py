"""IO layer: strict MEF XML ingestion (XInclude + RELAX NG + typed access)."""

from .xml import Document, Element, Validator  # noqa: F401
