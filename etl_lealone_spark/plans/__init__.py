"""Plan inspection & assertions (SURVEY.md §4)."""

from .explain import (
    count_exchanges,
    explain_str,
    has_broadcast_hash_join,
    has_partial_aggregate,
    has_take_ordered,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "explain_str",
    "has_broadcast_hash_join",
    "has_partial_aggregate",
    "has_take_ordered",
    "count_exchanges",
    "pushed_filters",
    "read_schema_columns",
]
