"""INFORMATION_SCHEMA virtual tables (reference: MetaTable.java:68 —
~30 meta tables over the catalog).

Built as small DataFrames from the engine catalog + spark.catalog state;
registered under ``information_schema_*`` temp views. These are
driver-side metadata enumerations — O(catalog size), never distributed.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:
    from ..session import EngineSession


def information_schema(session: "EngineSession") -> dict[str, DataFrame]:
    """Build and register the INFORMATION_SCHEMA views; returns them."""
    spark: SparkSession = session.spark
    cat = session.catalog

    tables_rows = [
        (name, "BASE TABLE", st.version, cat.warehouse)
        for name, st in cat.tables.items()
    ] + [(name, "VIEW", -1, "") for name in cat.views]
    tables = spark.createDataFrame(
        tables_rows or [("", "", -1, "")],
        "table_name string, table_type string, version int, storage string",
    )
    if not tables_rows:
        tables = tables.limit(0)

    col_rows = []
    for name, st in cat.tables.items():
        for i, f in enumerate(st.read().schema.fields):
            col_rows.append((name, f.name, i + 1, f.dataType.simpleString(), f.nullable))
    columns = spark.createDataFrame(
        col_rows or [("", "", 0, "", True)],
        "table_name string, column_name string, ordinal_position int, "
        "data_type string, is_nullable boolean",
    )
    if not col_rows:
        columns = columns.limit(0)

    idx_rows = [
        (m.name, m.table, ",".join(m.columns), m.unique)
        for m in cat.indexes.values()
    ]
    indexes = spark.createDataFrame(
        idx_rows or [("", "", "", False)],
        "index_name string, table_name string, columns string, is_unique boolean",
    )
    if not idx_rows:
        indexes = indexes.limit(0)

    seq_rows = [
        (s.name, s.start, s.increment, s.cache) for s in session.sequences.values()
    ]
    sequences = spark.createDataFrame(
        seq_rows or [("", 0, 0, 0)],
        "sequence_name string, start_value long, increment long, cache long",
    )
    if not seq_rows:
        sequences = sequences.limit(0)

    settings_rows = [(k, str(v)) for k, v in session.settings.items()]
    settings = spark.createDataFrame(
        settings_rows or [("", "")], "setting_name string, setting_value string"
    )
    if not settings_rows:
        settings = settings.limit(0)

    def _small(rows, schema):
        """Tiny driver-built meta view (empty-safe)."""
        sentinel_types = schema.split(", ")
        if rows:
            return spark.createDataFrame(rows, schema)
        sentinel = tuple(
            0 if " int" in c or " long" in c else (False if " boolean" in c else "")
            for c in sentinel_types
        )
        return spark.createDataFrame([sentinel], schema).limit(0)

    views_df = _small(
        [(n, sql) for n, sql in cat.views.items()],
        "view_name string, view_definition string",
    )
    domains = _small(
        [(n, t) for n, t in cat.domains.items()],
        "domain_name string, base_type string",
    )
    users = _small(
        [(p,) for p in sorted(cat.principals)], "principal_name string"
    )
    constraint_rows = []
    for tname, tc in cat.constraints.items():
        for c in tc.not_null:
            constraint_rows.append((tname, "NOT NULL", c))
        for c, e in tc.defaults.items():
            constraint_rows.append((tname, "DEFAULT", f"{c} = {e}"))
        for c, e in tc.computed.items():
            constraint_rows.append((tname, "COMPUTED", f"{c} AS {e}"))
        for e in tc.checks:
            constraint_rows.append((tname, "CHECK", e))
    constraints = _small(
        constraint_rows,
        "table_name string, constraint_type string, definition string",
    )
    from ..functions.registry import FUNCTIONS, UNSUPPORTED

    function_aliases = _small(
        [(n, "BUILTIN") for n in sorted(FUNCTIONS)]
        + [(n, "UNSUPPORTED") for n in sorted(UNSUPPORTED)],
        "function_name string, origin string",
    )
    from ..catalog import TYPE_MAP

    type_info = _small(
        [(sql_t, spark_t) for sql_t, spark_t in sorted(TYPE_MAP.items())],
        "sql_type string, spark_type string",
    )
    catalogs = _small([(cat.warehouse,)], "catalog_path string")
    sessions = _small(
        [
            (
                spark.sparkContext.applicationId,
                len(session.variables),
                len(session.prepared),
            )
        ],
        "session_id string, variable_count int, prepared_count int",
    )

    out = {
        "information_schema_tables": tables,
        "information_schema_columns": columns,
        "information_schema_indexes": indexes,
        "information_schema_sequences": sequences,
        "information_schema_settings": settings,
        "information_schema_views": views_df,
        "information_schema_domains": domains,
        "information_schema_users": users,
        "information_schema_constraints": constraints,
        "information_schema_function_aliases": function_aliases,
        "information_schema_type_info": type_info,
        "information_schema_catalogs": catalogs,
        "information_schema_sessions": sessions,
    }
    for name, df in out.items():
        df.createOrReplaceTempView(name)
    return out
