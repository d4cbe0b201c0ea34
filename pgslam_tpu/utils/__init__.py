"""Observability utilities: timers, counters, structured events."""

from .timing import StageTimer, counters, profile_trace  # noqa: F401
