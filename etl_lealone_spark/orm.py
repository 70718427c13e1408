"""Fluent typed-model query API (SURVEY.md §2.11).

The reference ships an ORM whose fluent surface chains typed property
predicates into SQL (lealone-orm/.../Model.java:67 — select:294,
where:424, findOne:443, findList:573, findCount:616, join:868). This is
the Spark-native equivalent: a thin fluent builder over DataFrame ops —
the "model" is a table (or any DataFrame), properties are columns, and
terminal methods execute.

Example::

    Customer = Model(es, "customer")
    rows = (Customer.select("c_name", "c_acctbal")
                    .where(Customer.c.c_acctbal > 1000)
                    .order_by("c_acctbal", desc=True)
                    .limit(10)
                    .find_list())

Everything stays a lazy DataFrame until a ``find_*`` terminal, so
Catalyst sees the whole chain — predicates push into the scan exactly
as with raw SQL.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Row
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from .session import EngineSession


class _Cols:
    """Attribute-style column access: ``model.c.col_name``."""

    def __init__(self, df: DataFrame):
        self.__dict__["_df"] = df

    def __getattr__(self, name: str) -> Column:
        if name in self._df.columns:
            return F.col(name)
        raise AttributeError(f"no such column: {name}")


class Model:
    """Fluent query over a cataloged table, temp view, or DataFrame."""

    def __init__(
        self,
        session: "EngineSession",
        source: Union[str, DataFrame],
    ):
        self._session = session
        if isinstance(source, str):
            key = source.lower()
            if key in session.catalog.tables:
                self._df = session.catalog.tables[key].read()
            else:
                self._df = session.spark.table(source)
            self._name = key
        else:
            self._df = source
            self._name = "anonymous"

    # -- column access ---------------------------------------------------
    @property
    def c(self) -> _Cols:
        return _Cols(self._df)

    def _with(self, df: DataFrame) -> "Model":
        m = Model.__new__(Model)
        m._session = self._session
        m._df = df
        m._name = self._name
        return m

    # -- fluent builders (Model.java select/where/join/orderBy/limit) ----
    def select(self, *cols: Union[str, Column]) -> "Model":
        return self._with(self._df.select(*cols))

    def where(self, *conds: Column) -> "Model":
        df = self._df
        for c in conds:
            df = df.filter(c)
        return self._with(df)

    def join(
        self,
        other: Union["Model", DataFrame, str],
        on: Union[str, Sequence[str], Column],
        how: str = "inner",
    ) -> "Model":
        if isinstance(other, str):
            other = Model(self._session, other)
        odf = other._df if isinstance(other, Model) else other
        return self._with(self._df.join(odf, on, how))

    def order_by(self, *cols: Union[str, Column], desc: bool = False) -> "Model":
        ordered = [
            (F.col(c) if isinstance(c, str) else c).desc()
            if desc
            else (F.col(c) if isinstance(c, str) else c)
            for c in cols
        ]
        return self._with(self._df.orderBy(*ordered))

    def group_by(self, *cols: Union[str, Column]):
        return _GroupedModel(self, self._df.groupBy(*cols))

    def limit(self, n: int) -> "Model":
        return self._with(self._df.limit(n))

    def offset(self, n: int) -> "Model":
        return self._with(self._df.offset(n))

    def distinct(self) -> "Model":
        return self._with(self._df.distinct())

    # -- terminals (Model.java findOne/findList/findCount) ---------------
    def find_list(self) -> list[Row]:
        return self._df.collect()

    def find_one(self) -> Optional[Row]:
        rows = self._df.limit(1).collect()
        return rows[0] if rows else None

    def find_count(self) -> int:
        return self._df.count()

    def to_df(self) -> DataFrame:
        return self._df

    # -- mutations (Model.java insert/update/delete) ----------------------
    def insert(self, **values: Any) -> None:
        st = self._session.catalog.table(self._name)
        cols = [f.name for f in st.read().schema.fields]
        row = tuple(values.get(c) for c in cols)
        src = self._session.spark.createDataFrame([row], st.read().schema)
        st.insert(src)
        self._session.catalog.refresh_view(self._name)

    def update(self, condition: Column, **assignments: Any) -> None:
        st = self._session.catalog.table(self._name)
        st.update(
            condition,
            {
                k: (v if isinstance(v, Column) else F.lit(v))
                for k, v in assignments.items()
            },
        )
        self._session.catalog.refresh_view(self._name)

    def delete(self, condition: Column) -> None:
        st = self._session.catalog.table(self._name)
        st.delete(condition)
        self._session.catalog.refresh_view(self._name)


class _GroupedModel:
    def __init__(self, model: Model, grouped):
        self._model = model
        self._grouped = grouped

    def agg(self, *exprs: Column) -> Model:
        return self._model._with(self._grouped.agg(*exprs))

    def count(self) -> Model:
        return self._model._with(self._grouped.count())
