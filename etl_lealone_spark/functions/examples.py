"""Importable example functions for the CREATE ALIAS / CREATE AGGREGATE
``FOR "dotted.path"`` form (the reference ships equivalent Java test
classes for CreateFunctionAlias/CreateAggregate — e.g. the MEDIAN sample
in h2-compatible docs; protocol: api/AggregateFunction.java:16-50).

These live in the engine package so Spark python workers can import them
by reference when a registered UDF/UDAF is shipped to executors.
"""

from __future__ import annotations

from .udf_adapter import AggregateFunction


def slugify(s: str) -> str:
    """Scalar example: lowercase, alnum runs joined by dashes."""
    import re

    if s is None:
        return None
    return re.sub(r"[^a-z0-9]+", "-", s.lower()).strip("-")


class Median(AggregateFunction):
    """The canonical CREATE AGGREGATE example (4-method protocol)."""

    def init(self) -> None:
        self.values: list[float] = []

    def get_type(self, arg_types: list[str]) -> str:
        return "double"

    def add(self, value) -> None:
        if value is not None:
            self.values.append(float(value))

    def get_result(self):
        if not self.values:
            return None
        s = sorted(self.values)
        n = len(s)
        mid = n // 2
        return s[mid] if n % 2 else (s[mid - 1] + s[mid]) / 2.0
