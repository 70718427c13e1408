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


class Property:
    """Typed column property with the reference's predicate surface.

    Mirrors lealone-orm property classes: PBaseValueEqual.java (eq:53,
    ne:68, in:84, notIn:100), PBaseComparable.java (gt:52, ge:67, lt:82,
    le:97, between:113), PString.java (ieq:59, like:89, startsWith:104,
    endsWith:119, contains:134, ilike:149, match:211). Every predicate
    returns a Catalyst ``Column``, so conditions compose with ``&``/``|``
    and push into the parquet scan like hand-written filters.
    """

    def __init__(self, name: str, qualifier: Optional[str] = None):
        self.name = name
        self._col = F.col(f"{qualifier}.{name}" if qualifier else name)

    # -- PBaseValueEqual ------------------------------------------------
    def eq(self, value: Any) -> Column:
        return self._col.eqNullSafe(value) if value is None else self._col == value

    def ne(self, value: Any) -> Column:
        return self._col != value

    def in_(self, *values: Any) -> Column:
        vals = values[0] if len(values) == 1 and isinstance(values[0], (list, tuple, set)) else values
        return self._col.isin(*vals)

    def not_in(self, *values: Any) -> Column:
        return ~self.in_(*values)

    # -- PBaseComparable ------------------------------------------------
    def gt(self, value: Any) -> Column:
        return self._col > value

    def ge(self, value: Any) -> Column:
        return self._col >= value

    def lt(self, value: Any) -> Column:
        return self._col < value

    def le(self, value: Any) -> Column:
        return self._col <= value

    def between(self, lower: Any, upper: Any) -> Column:
        return self._col.between(lower, upper)

    # -- null tests (PBaseValueEqual isNull/isNotNull) ------------------
    def is_null(self) -> Column:
        return self._col.isNull()

    def is_not_null(self) -> Column:
        return self._col.isNotNull()

    # -- PString --------------------------------------------------------
    def like(self, pattern: str) -> Column:
        return self._col.like(pattern)

    def ilike(self, pattern: str) -> Column:
        return self._col.ilike(pattern)

    def ieq(self, value: str) -> Column:
        return F.lower(self._col) == value.lower()

    def starts_with(self, prefix: str) -> Column:
        return self._col.startswith(prefix)

    def ends_with(self, suffix: str) -> Column:
        return self._col.endswith(suffix)

    def contains(self, sub: str) -> Column:
        return self._col.contains(sub)

    def istarts_with(self, prefix: str) -> Column:
        return F.lower(self._col).startswith(prefix.lower())

    def iends_with(self, suffix: str) -> Column:
        return F.lower(self._col).endswith(suffix.lower())

    def icontains(self, sub: str) -> Column:
        return F.lower(self._col).contains(sub.lower())

    def match(self, regex: str) -> Column:
        return self._col.rlike(regex)

    # -- ordering / projection -----------------------------------------
    def asc(self) -> Column:
        return self._col.asc()

    def desc(self) -> Column:
        return self._col.desc()

    def alias(self, name: str) -> Column:
        return self._col.alias(name)

    @property
    def col(self) -> Column:
        return self._col

    # properties double as Columns in select()/operators via these:
    def __eq__(self, other: Any) -> Column:  # type: ignore[override]
        return self._col == other

    def __ne__(self, other: Any) -> Column:  # type: ignore[override]
        return self._col != other

    def __gt__(self, other: Any) -> Column:
        return self._col > other

    def __ge__(self, other: Any) -> Column:
        return self._col >= other

    def __lt__(self, other: Any) -> Column:
        return self._col < other

    def __le__(self, other: Any) -> Column:
        return self._col <= other

    def __hash__(self) -> int:
        return hash(self.name)


class _Cols:
    """Attribute-style column access: ``model.c.col_name``."""

    def __init__(self, df: DataFrame):
        self.__dict__["_df"] = df

    def __getattr__(self, name: str) -> Column:
        if name in self._df.columns:
            return F.col(name)
        raise AttributeError(f"no such column: {name}")


class _Props:
    """Attribute-style typed-property access: ``model.p.col_name``."""

    def __init__(self, df: DataFrame):
        self.__dict__["_df"] = df

    def __getattr__(self, name: str) -> Property:
        if name in self._df.columns:
            return Property(name)
        raise AttributeError(f"no such column: {name}")


class WhereBuilder:
    """Fluent predicate chain (Model.java where:424 / or:xxx / and):

        (Customer.where().c_acctbal.gt(1000)
                         .or_().c_mktsegment.eq("BUILDING")
                         .find_list())

    Attribute access yields a bound property; calling a predicate on it
    appends the condition with the pending connective (AND by default).
    The whole chain stays one Catalyst filter expression.
    """

    def __init__(self, model: "Model"):
        self._model = model
        self._expr: Optional[Column] = None
        self._pending_or = False
        self._negate = False
        # lp()/rp() grouping (ExpressionBuilder.java lp/rp): each lp
        # pushes the outer (expr, pending-or, negate) state; rp pops it
        # and appends the inner group as ONE condition
        self._group_stack: list[tuple[Optional[Column], bool, bool]] = []

    def __getattr__(self, name: str):
        if name in self._model._df.columns:
            return _BoundProperty(self, Property(name))
        raise AttributeError(name)

    def or_(self) -> "WhereBuilder":
        self._pending_or = True
        return self

    def and_(self) -> "WhereBuilder":
        self._pending_or = False
        return self

    def not_(self) -> "WhereBuilder":
        self._negate = True
        return self

    def lp(self) -> "WhereBuilder":
        """Open a parenthesized group (reference ExpressionBuilder.lp):
        ``where().a.eq(1).and_().lp().b.eq(2).or_().b.eq(3).rp()`` ≡
        ``a = 1 AND (b = 2 OR b = 3)``."""
        self._group_stack.append((self._expr, self._pending_or, self._negate))
        self._expr, self._pending_or, self._negate = None, False, False
        return self

    def rp(self) -> "WhereBuilder":
        """Close the innermost lp() group."""
        if not self._group_stack:
            raise ValueError("rp() without matching lp()")
        inner = self._expr
        self._expr, self._pending_or, self._negate = self._group_stack.pop()
        if inner is not None:
            self.cond(inner)
        return self

    def cond(self, condition: Column) -> "WhereBuilder":
        """Append an arbitrary Column condition into the chain."""
        if self._negate:
            condition = ~condition
            self._negate = False
        if self._expr is None:
            self._expr = condition
        elif self._pending_or:
            self._expr = self._expr | condition
            self._pending_or = False
        else:
            self._expr = self._expr & condition
        return self

    # terminals delegate to the filtered model
    def _filtered(self) -> "Model":
        if self._group_stack:
            raise ValueError("unbalanced lp(): missing rp() before terminal")
        if self._expr is None:
            return self._model
        return self._model._with(self._model._df.filter(self._expr))

    def select(self, *cols):
        return self._filtered().select(*cols)

    def order_by(self, *cols, desc: bool = False):
        return self._filtered().order_by(*cols, desc=desc)

    def limit(self, n: int):
        return self._filtered().limit(n)

    def find_list(self):
        return self._filtered().find_list()

    def find_one(self):
        return self._filtered().find_one()

    def find_count(self) -> int:
        return self._filtered().find_count()

    def to_df(self) -> DataFrame:
        return self._filtered().to_df()


class _BoundProperty:
    """A property inside a WhereBuilder chain: predicate calls append the
    condition and hand the chain back (reference: each P* method returns
    the root model R)."""

    def __init__(self, builder: WhereBuilder, prop: Property):
        self._b = builder
        self._p = prop

    def __getattr__(self, name: str):
        method = getattr(self._p, name)

        def apply(*args: Any) -> WhereBuilder:
            return self._b.cond(method(*args))

        return apply


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

    @property
    def p(self) -> _Props:
        """Typed properties (reference lealone-orm P* classes):
        ``m.p.name.eq("x")``, ``m.p.amt.between(1, 5)``…"""
        return _Props(self._df)

    def _with(self, df: DataFrame) -> "Model":
        m = Model.__new__(Model)
        m._session = self._session
        m._df = df
        m._name = self._name
        return m

    # -- fluent builders (Model.java select/where/join/orderBy/limit) ----
    def select(self, *cols: Union[str, Column]) -> "Model":
        return self._with(self._df.select(*cols))

    def where(self, *conds: Column):
        """With arguments: filter by the given conditions (AND).
        Without arguments: open a fluent predicate chain —
        ``m.where().id.eq(100).or_().name.like("c%").find_list()``
        (Model.java where:424)."""
        if not conds:
            return WhereBuilder(self)
        df = self._df
        for c in conds:
            df = df.filter(c)
        return self._with(df)

    def join(
        self,
        other: Union["Model", DataFrame, str],
        on: Union[str, Sequence[str], Column, None] = None,
        how: str = "inner",
    ):
        """With ``on``: immediate join. Without: the reference's deferred
        form — ``c.join(o).on(c.c.id == o.c.customer_id)`` (Model.java
        join:868 / on())."""
        if isinstance(other, str):
            other = Model(self._session, other)
        odf = other._df if isinstance(other, Model) else other
        if on is None:
            return _JoinBuilder(self, odf, how)
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

    def with_children(
        self,
        child: Union["Model", DataFrame, str],
        on: Column,
        alias: str = "children",
    ) -> "Model":
        """Parent→child relation navigation, Spark-style.

        The reference materializes object graphs from join results
        (OrmJoinTest: ``customer.getOrderList()`` after
        ``c.join(o).on()...``); the DataFrame-native equivalent nests the
        matching child rows as an ``array<struct>`` column — one left
        join + one aggregation, and the parent row count is preserved
        (parents without children get an empty array).
        """
        if isinstance(child, str):
            child = Model(self._session, child)
        odf = child._df if isinstance(child, Model) else child
        parent_cols = self._df.columns
        # NULL out the struct when the left join found no match (all child
        # columns NULL) — collect_list skips NULLs → unmatched parents []
        matched = F.coalesce(*[odf[c].cast("string") for c in odf.columns])
        child_struct = F.when(
            matched.isNotNull(), F.struct(*[odf[c] for c in odf.columns])
        )
        joined = self._df.join(odf, on, "left")
        nested = joined.groupBy(*[self._df[c] for c in parent_cols]).agg(
            F.collect_list(child_struct).alias(alias)
        )
        return self._with(nested)

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
    def new(self) -> "RowBuilder":
        """Fluent row construction (reference style:
        ``new Customer().id.set(100).name.set("c1").insert()`` →
        ``Customer.new().id.set(100).name.set("c1").insert()``)."""
        return RowBuilder(self)

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


class _JoinBuilder:
    """Deferred join condition: ``model.join(other).on(cond)``."""

    def __init__(self, model: Model, odf: DataFrame, how: str):
        self._model = model
        self._odf = odf
        self._how = how

    def on(self, condition: Union[str, Sequence[str], Column]) -> Model:
        return self._model._with(
            self._model._df.join(self._odf, condition, self._how)
        )


class RowBuilder:
    """Fluent single-row insert: property access returns a setter whose
    ``set(v)`` records the value and returns the builder."""

    def __init__(self, model: Model):
        self.__dict__["_model"] = model
        self.__dict__["_values"] = {}

    def __getattr__(self, name: str) -> "_Setter":
        if name in self._model._df.columns:
            return _Setter(self, name)
        raise AttributeError(f"no such column: {name}")

    def insert(self) -> None:
        self._model.insert(**self._values)


class _Setter:
    def __init__(self, builder: RowBuilder, name: str):
        self._b = builder
        self._name = name

    def set(self, value: Any) -> RowBuilder:
        self._b._values[self._name] = value
        return self._b


class _GroupedModel:
    def __init__(self, model: Model, grouped):
        self._model = model
        self._grouped = grouped

    def agg(self, *exprs: Column) -> Model:
        return self._model._with(self._grouped.agg(*exprs))

    def count(self) -> Model:
        return self._model._with(self._grouped.count())
