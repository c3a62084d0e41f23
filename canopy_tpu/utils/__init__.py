"""Utilities: synthetic model generation, timers, roofline accounting."""
