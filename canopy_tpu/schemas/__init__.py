"""Shipped RELAX NG schemas (reference env.h:27-49 points at installed
input/report/project grammars it never vendors; these are bundled)."""

import os

__all__ = ["default_schema_path", "report_schema_path",
           "project_schema_path"]


def default_schema_path() -> str:
    """The bundled MEF input grammar (analogue of env.h's input.rng)."""
    return os.path.join(os.path.dirname(__file__), "mef.rng")


def report_schema_path() -> str:
    """The bundled report grammar (analogue of env.h's report.rng)."""
    return os.path.join(os.path.dirname(__file__), "report.rng")


def project_schema_path() -> str:
    """The bundled project grammar (analogue of env.h's project.rng)."""
    return os.path.join(os.path.dirname(__file__), "project.rng")
