"""Physical-plan inspection helpers (Catalyst-awareness checks)."""

from .checks import explain_str, has_broadcast_join, pushed_filters, python_stage_count

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "pushed_filters",
    "python_stage_count",
]
