"""Quantification engines: JAX/XLA/Pallas compute paths."""

from .propagate import (make_propagator, propagate_probability,  # noqa: F401
                        top_event_probability)
