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
        + [(n, "UNSUPPORTED") for n in sorted(UNSUPPORTED)]
        + [(n, "ALIAS") for n in sorted(session.fn_alias_builtins)]
        + [(n, "ALIAS") for n in sorted(session.udfs.aliases)]
        + [(n, "AGGREGATE") for n in sorted(session.udfs.aggregates)],
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

    # ------------------------------------------------------------------
    # MetaTable.java:107 defines META_TABLE_TYPE_COUNT = 30; the 17 views
    # below complete that inventory (column sets mirror MetaTable.java:
    # 140-295, lowercased to match this module's convention — Spark SQL
    # resolves identifiers case-insensitively)
    # ------------------------------------------------------------------
    rem = cat.comments.get  # object name → REMARKS

    schemata = _small(
        [
            (cat.warehouse, n, owner, "Unicode", "OFF", n == "public", rem(n, ""))
            for n, owner in sorted(cat.schemas.items())
        ],
        "catalog_name string, schema_name string, schema_owner string, "
        "default_character_set_name string, default_collation_name string, "
        "is_default boolean, remarks string",
    )
    # MetaTable.java:595-599: STANDARD_TABLE / META_TABLE / VIEW
    table_types = _small(
        [("TABLE",), ("SYSTEM TABLE",), ("VIEW",)], "type string"
    )
    roles = _small(
        [(n, rem(n, "")) for n in sorted(cat.roles)],
        "name string, remarks string",
    )
    rights = _small(
        [
            (who, "USER" if who in cat.principals else "ROLE", "", r, "public", obj)
            for who, r, obj in cat.grants
        ],
        "grantee string, granteetype string, grantedrole string, "
        "rights string, table_schema string, table_name string",
    )
    table_privileges = _small(
        [
            ("sa", who, cat.warehouse, "public", obj, priv, "NO")
            for who, r, obj in cat.grants
            if r != "ROLE"
            for priv in r.split(",")
        ],
        "grantor string, grantee string, table_catalog string, "
        "table_schema string, table_name string, privilege_type string, "
        "is_grantable string",
    )
    column_privileges = _small(
        [
            ("sa", who, cat.warehouse, "public", obj, f.name, priv, "NO")
            for who, r, obj in cat.grants
            if r != "ROLE" and obj in cat.tables
            for priv in r.split(",")
            for f in cat.tables[obj].read().schema.fields
        ],
        "grantor string, grantee string, table_catalog string, "
        "table_schema string, table_name string, column_name string, "
        "privilege_type string, is_grantable string",
    )
    from ..catalog import _COLLATION_LOCALES

    collations = _small(
        [("OFF", ""), ("UTF8_LCASE", "utf8_lcase"), ("UNICODE", "unicode"),
         ("UNICODE_CI", "unicode_ci")]
        + [
            (name, locale)
            for name, locale in sorted(_COLLATION_LOCALES.items())
        ],
        "name string, key string",
    )
    help_rows = [
        (i, "Commands", topic, syntax, text)
        for i, (topic, syntax, text) in enumerate(
            [
                ("SELECT", "SELECT ... FROM ... [WHERE ...]", "Query rows."),
                ("INSERT", "INSERT INTO t [(cols)] VALUES (...) | SELECT ...", "Insert rows."),
                ("UPDATE", "UPDATE t SET c=v [WHERE ...] [LIMIT n]", "Update rows."),
                ("DELETE", "DELETE FROM t [WHERE ...] [LIMIT n]", "Delete rows."),
                ("MERGE", "MERGE INTO t [KEY(...)] VALUES ... | MERGE INTO t USING ...", "Upsert rows."),
                ("CREATE TABLE", "CREATE TABLE t (col type [constraints], ...)", "Create a table."),
                ("CREATE VIEW", "CREATE [OR REPLACE] VIEW v AS query", "Create a view."),
                ("CREATE INDEX", "CREATE [UNIQUE] INDEX i ON t (cols)", "Create an index (metadata)."),
                ("CREATE SCHEMA", "CREATE SCHEMA s [AUTHORIZATION owner]", "Create a schema."),
                ("CREATE SEQUENCE", "CREATE SEQUENCE s [START WITH n] [INCREMENT BY n]", "Create a sequence."),
                ("CREATE CONSTANT", "CREATE CONSTANT c VALUE expr", "Create a named constant."),
                ("ALTER TABLE", "ALTER TABLE t ADD|DROP|RENAME|ALTER COLUMN ...", "Evolve a table."),
                ("SCRIPT", "SCRIPT [TO 'file']", "Dump schema+data as SQL."),
                ("RUNSCRIPT", "RUNSCRIPT FROM 'file'", "Replay a SQL script."),
                ("EXPLAIN", "EXPLAIN [ANALYZE] query", "Show the query plan."),
                ("CALL", "CALL expr", "Evaluate an expression."),
                ("SET", "SET name value", "Set a session setting."),
            ]
        )
    ]
    help_view = _small(
        help_rows,
        "id int, section string, topic string, syntax string, text string",
    )
    triggers = _small(
        [
            (cat.warehouse, "public", n, "NOT FIRED", cat.warehouse, "public",
             "", False, "", 0, False, rem(n, ""), ddl, i)
            for i, (n, ddl) in enumerate(sorted(cat.triggers.items()))
        ],
        "trigger_catalog string, trigger_schema string, trigger_name string, "
        "trigger_type string, table_catalog string, table_schema string, "
        "table_name string, before boolean, java_class string, "
        "queue_size int, no_wait boolean, remarks string, sql string, id int",
    )
    constants = _small(
        [
            (cat.warehouse, "public", n, expr, rem(n, ""), i)
            for i, (n, expr) in enumerate(sorted(cat.constants.items()))
        ],
        "constant_catalog string, constant_schema string, constant_name "
        "string, sql string, remarks string, id int",
    )
    services = _small(
        [
            (cat.warehouse, "public", n, ",".join(sorted(m.methods)),
             m.package, m.implement_by, m.code_path, i)
            for i, (n, m) in enumerate(sorted(cat.services.items()))
        ],
        "service_catalog string, service_schema string, service_name "
        "string, methods string, package string, implement_by string, "
        "code_path string, id int",
    )
    xref_rows = []
    for tname, tc in cat.constraints.items():
        for fk_name, fk_cols, ref_table, ref_cols in tc.foreign_keys:
            rc = ref_cols or fk_cols
            for pos, (fc, pc) in enumerate(zip(fk_cols, rc), start=1):
                xref_rows.append(
                    (cat.warehouse, "public", ref_table, pc,
                     cat.warehouse, "public", tname, fc, pos,
                     fk_name or f"__fk_{tname}", f"__pk_{ref_table}")
                )
    cross_references = _small(
        xref_rows,
        "pktable_catalog string, pktable_schema string, pktable_name string, "
        "pkcolumn_name string, fktable_catalog string, fktable_schema string, "
        "fktable_name string, fkcolumn_name string, ordinal_position int, "
        "fk_name string, pk_name string",
    )
    # FUNCTION_COLUMNS describes Java-method parameters of user aliases
    # (MetaTable.java:200); builtins carry no declared parameter metadata,
    # so this enumerates registered UDF parameter slots only
    function_columns = _small(
        [],
        "alias_catalog string, alias_schema string, alias_name string, "
        "column_count int, pos int, column_name string, type_name string, "
        "remarks string",
    )
    qs_rows = [
        (sql, st[0],
         round(st[1], 6), round(st[2], 6), round(st[3], 6),
         round(st[3] / st[0], 6) if st[0] else 0.0)
        for sql, st in session.query_stats.items()
    ]
    query_statistics = _small(
        qs_rows,
        "sql_statement string, execution_count int, min_execution_time "
        "double, max_execution_time double, cumulative_execution_time "
        "double, average_execution_time double",
    )
    # SESSION_STATE: replayable SQL restoring this session (MetaTable:
    # SESSION_STATE emits SET commands for variables)
    ss_rows = [
        (f"VARIABLE {k}", f"SET @{k} {v!r}") for k, v in session.variables.items()
    ] + [
        (f"SETTING {k}", f"SET {k} {v}") for k, v in session.settings.items()
    ]
    session_state = _small(ss_rows, "key string, sql string")
    # snapshot storage is lock-free (readers never block writers); the
    # LOCKS/IN_DOUBT surfaces exist with their reference schemas, empty
    locks = _small(
        [], "table_schema string, table_name string, session_id int, "
        "lock_type string",
    )
    in_doubt = _small([], "transaction string, state string")
    databases = _small(
        [(cat.warehouse, "client_server", spark.sparkContext.master)],
        "database_name string, run_mode string, nodes string",
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
        "information_schema_schemata": schemata,
        "information_schema_table_types": table_types,
        "information_schema_roles": roles,
        "information_schema_rights": rights,
        "information_schema_table_privileges": table_privileges,
        "information_schema_column_privileges": column_privileges,
        "information_schema_collations": collations,
        "information_schema_help": help_view,
        "information_schema_triggers": triggers,
        "information_schema_constants": constants,
        "information_schema_cross_references": cross_references,
        "information_schema_function_columns": function_columns,
        "information_schema_query_statistics": query_statistics,
        "information_schema_session_state": session_state,
        "information_schema_locks": locks,
        "information_schema_in_doubt": in_doubt,
        "information_schema_databases": databases,
        # extension beyond the reference's 30 meta views: the CREATE
        # SERVICE registry (services.py)
        "information_schema_services": services,
    }
    for name, df in out.items():
        df.createOrReplaceTempView(name)
    return out
