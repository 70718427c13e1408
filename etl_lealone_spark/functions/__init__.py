"""Scalar function catalog (SURVEY.md §2.8).

``FUNCTIONS`` maps every reference function name (registry:
lealone-sql/.../expression/function/Function.java:188-381) to a builder
returning a pyspark Column. ``register_udfs(spark)`` registers the few
genuinely-Python implementations for SQL use.
"""

from .registry import FUNCTIONS, call, register_udfs, unsupported_names

__all__ = ["FUNCTIONS", "call", "register_udfs", "unsupported_names"]
