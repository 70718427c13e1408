"""User-defined function/aggregate surface (SURVEY.md §2.13).

The reference exposes:
- CREATE ALIAS (scalar UDF from Java source/class):
  ddl/CreateFunctionAlias.java:25, call wrapper JavaFunction.java:28
- CREATE AGGREGATE with the 4-method protocol
  ``init(conn) / getInternalType(types) / add(value) / getResult()``:
  lealone-common/.../api/AggregateFunction.java:16-50, JavaAggregate.java:31

Spark-native equivalents:
- scalar: ``create_alias`` registers a Python callable (row UDF or
  pandas_udf for the vectorized path) with spark.udf.register.
- aggregate: ``create_aggregate`` adapts the SAME 4-method protocol onto
  ``applyInPandas`` — per-group the adapter instantiates the user class,
  feeds values through add(), emits get_result(). Arrow-batched; state
  never leaves the executor. For algebraic aggregates prefer built-ins —
  this path exists for protocol parity.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Type

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class AggregateFunction:
    """The reference's UDAF protocol (api/AggregateFunction.java:16-50)."""

    def init(self) -> None:  # connection arg dropped: no JDBC here
        pass

    def get_type(self, arg_types: list[str]) -> str:
        """Spark SQL type string of the result, given argument types."""
        raise NotImplementedError

    def add(self, value) -> None:
        raise NotImplementedError

    def get_result(self):
        raise NotImplementedError


class UdfRegistry:
    """CREATE ALIAS / CREATE AGGREGATE registry for a session."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.aliases: dict[str, Callable] = {}
        self.aggregates: dict[str, Type[AggregateFunction]] = {}

    # -- scalar (CREATE ALIAS) ------------------------------------------
    def create_alias(
        self,
        name: str,
        fn: Callable,
        return_type: str = "string",
        vectorized: bool = False,
    ) -> None:
        """Register a scalar UDF under ``name`` for SQL + DataFrame use.

        ``vectorized=True`` expects fn: pd.Series -> pd.Series and
        registers a pandas_udf (Arrow path, ~10-100× faster).
        """
        key = name.upper()
        if vectorized:
            udf = F.pandas_udf(fn, return_type)
        else:
            udf = F.udf(fn, return_type)
        self.spark.udf.register(key, udf)
        self.aliases[key] = fn

    def drop_alias(self, name: str) -> None:
        self.aliases.pop(name.upper(), None)

    # -- table-valued (UDTF-ish: UDF returning a result set usable in
    # FROM — FunctionTable.java:33; CSVREAD registered this way) ---------
    def create_table_alias(self, name: str, fn: Callable[..., DataFrame]) -> None:
        """Register a function returning a DataFrame; ``call_table``
        invokes it and registers the result as a temp view under the
        alias so SQL can select FROM it."""
        self.aliases[name.upper()] = fn

    def call_table(self, name: str, *args, **kwargs) -> DataFrame:
        df = self.aliases[name.upper()](*args, **kwargs)
        df.createOrReplaceTempView(name.lower())
        return df

    def create_udtf(self, name: str, cls: type, return_type: str) -> None:
        """Register a true Python UDTF (Spark 3.5+): a class with an
        ``eval(self, *args)`` generator yielding output tuples, callable
        directly in FROM — ``SELECT * FROM name(...)`` — including
        LATERAL joins against real tables. This is the full-fidelity
        version of the reference's ResultSet-returning functions
        (FunctionTable.java:33); ``create_table_alias`` remains the
        Python-API variant."""
        key = name.upper()
        udtf_cls = F.udtf(cls, returnType=return_type)
        self.spark.udtf.register(key, udtf_cls)
        self.aliases[key] = cls

    # -- aggregate (CREATE AGGREGATE) -----------------------------------
    def create_aggregate(self, name: str, cls: Type[AggregateFunction]) -> None:
        self.aggregates[name.upper()] = cls

    def create_sql_aggregate(
        self, name: str, cls: Type[AggregateFunction], return_type: str | None = None
    ) -> None:
        """Register a 4-method aggregate as a SQL-callable grouped-agg
        pandas UDF — the full-fidelity CREATE AGGREGATE mapping
        (JavaAggregate.java:31 makes the class callable in any GROUP BY;
        here the class is wrapped in an Arrow-batched Series→scalar UDF,
        so ``SELECT name(col) FROM t GROUP BY k`` works natively and the
        per-group fold runs executor-side).

        ``return_type`` defaults to probing ``cls().get_type(["double"])``;
        SQL-registered aggregates therefore need an argument-type-
        independent result type (true of the reference's test aggregates —
        JavaAggregate re-resolves per query, a luxury a registered UDF
        signature doesn't have).
        """
        if return_type is None:
            probe = cls()
            probe.init()
            try:
                return_type = probe.get_type(["double"])
            except Exception:
                return_type = "double"
        py_type = {
            "double": float, "float": float, "int": int, "bigint": int,
            "long": int, "smallint": int, "string": str, "boolean": bool,
        }.get(return_type.split("(")[0].strip().lower(), float)

        def fold(v):
            agg = cls()
            agg.init()
            for x in v:
                agg.add(x)
            return agg.get_result()

        fold.__annotations__ = {"v": pd.Series, "return": py_type}
        self.spark.udf.register(name.upper(), F.pandas_udf(fold, return_type))
        self.aggregates[name.upper()] = cls

    def drop_aggregate(self, name: str) -> None:
        self.aggregates.pop(name.upper(), None)

    def apply_aggregate(
        self,
        name: str,
        df: DataFrame,
        value_col: str,
        group_by: Optional[list[str]] = None,
        result_col: Optional[str] = None,
    ) -> DataFrame:
        """Run a registered 4-method aggregate over ``df``.

        Grouped: one adapter instance per group via applyInPandas (state
        stays executor-side, groups processed in parallel). Global: the
        input is first combined per-partition IF the aggregate declares a
        ``merge(other_result)`` classmethod, else single-group fallback.
        """
        cls = self.aggregates[name.upper()]
        probe = cls()
        probe.init()
        rtype = probe.get_type([dict(df.dtypes).get(value_col, "string")])
        out_col = result_col or name.lower()

        keys = group_by or []
        if keys:
            out_schema = ", ".join(
                f"{k} {dict(df.dtypes)[k]}" for k in keys
            ) + f", {out_col} {rtype}"

            def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
                agg = cls()
                agg.init()
                for v in pdf[value_col]:
                    agg.add(v)
                head = {k: [pdf[k].iloc[0]] for k in keys}
                head[out_col] = [agg.get_result()]
                return pd.DataFrame(head)

            return df.groupBy(*keys).applyInPandas(per_group, out_schema)

        # global aggregate: single group (driver-size result)
        def whole(it: Iterable[pd.DataFrame]):
            agg = cls()
            agg.init()
            for pdf in it:
                for v in pdf[value_col]:
                    agg.add(v)
            yield pd.DataFrame({out_col: [agg.get_result()]})

        # one partition so a single instance sees all values (protocol is
        # order-agnostic per the reference contract)
        return (
            df.select(value_col)
            .coalesce(1)
            .mapInPandas(whole, f"{out_col} {rtype}")
        )
