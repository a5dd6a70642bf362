"""Utilities: per-stage pipeline timers (timing.py)."""
from .timing import timers  # noqa: F401
