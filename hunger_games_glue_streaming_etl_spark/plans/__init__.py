"""Import all plan modules so their ``@register`` decorators populate the
registry, then re-export it."""

from .registry import ORACLE, QUERIES, register

from . import aggregates, core, event_time, scalars, setops_sort, windows  # noqa: E402,F401

__all__ = ["ORACLE", "QUERIES", "register"]
