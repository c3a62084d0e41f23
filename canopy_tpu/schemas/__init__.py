"""Shipped RELAX NG schemas for MEF input validation."""

import os

__all__ = ["default_schema_path"]


def default_schema_path() -> str:
    """The bundled MEF input grammar (analogue of env.h's input.rng)."""
    return os.path.join(os.path.dirname(__file__), "mef.rng")
