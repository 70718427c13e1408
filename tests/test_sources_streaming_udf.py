"""Sources (CSV, INFORMATION_SCHEMA), streaming carriers, UDF/UDAF
adapter tests."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_lealone_spark.functions.udf_adapter import AggregateFunction, UdfRegistry
from etl_lealone_spark.session import EngineSession
from etl_lealone_spark.sources import csvread, csvwrite, information_schema
from etl_lealone_spark.streaming import (
    sessionize_stream,
    stream_from_parquet_dir,
    streaming_dedup,
    streaming_tumbling_agg,
)


# --- CSV (CSVREAD/CSVWRITE, Function.java:352-353) --------------------------
def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", "x")], "id int, s string, n string"
    )
    out = str(tmp_path / "out_csv")
    csvwrite(df, out, field_separator=";", null_string="NULL", single_file=True)
    back = csvread(spark, out, field_separator=";", null_string="NULL")
    rows = {r["id"]: (r["s"], r["n"]) for r in back.collect()}
    assert rows == {"1": ("a", None), "2": ("b", "x")}  # all VARCHAR, like the reference


def test_csvread_column_override(spark, tmp_path):
    p = str(tmp_path / "h.csv")
    with open(p, "w") as f:
        f.write("x,y\n1,2\n")
    df = csvread(spark, p, columns=["a", "b"])
    assert df.columns == ["a", "b"]


# --- INFORMATION_SCHEMA (MetaTable.java:68) ---------------------------------
def test_information_schema(spark, tmp_path):
    es = EngineSession(spark, warehouse=str(tmp_path))
    es.sql("CREATE TABLE its (id int PRIMARY KEY, name varchar(10))")
    es.sql("CREATE INDEX idx_n ON its(name)")
    es.sql("CREATE SEQUENCE sq START WITH 5")
    es.sql("SET FOO bar")
    info = information_schema(es)
    tabs = {r["table_name"] for r in info["information_schema_tables"].collect()}
    assert "its" in tabs
    cols = [
        (r["column_name"], r["data_type"])
        for r in info["information_schema_columns"]
        .filter("table_name = 'its'")
        .orderBy("ordinal_position")
        .collect()
    ]
    assert cols == [("id", "int"), ("name", "string")]
    idx = {r["index_name"] for r in info["information_schema_indexes"].collect()}
    assert "idx_n" in idx and "__pk_its" in idx
    # queryable through SQL too
    assert (
        es.sql("SELECT count(*) FROM information_schema_sequences").collect()[0][0]
        == 1
    )


def test_information_schema_dotted_and_show(spark, tmp_path):
    """The reference's dotted INFORMATION_SCHEMA.X references and the
    SHOW family (Parser.java:884 parseShow) work through the shell."""
    es = EngineSession(spark, warehouse=str(tmp_path))
    es.sql("CREATE TABLE st1 (id int PRIMARY KEY, name varchar(10))")
    es.sql("CREATE TABLE st2 (k int)")
    tabs = {
        r["table_name"]
        for r in es.sql(
            "SELECT table_name FROM INFORMATION_SCHEMA.TABLES"
        ).collect()
    }
    assert {"st1", "st2"} <= tabs
    # views refresh against catalog mutations between statements
    es.sql("CREATE TABLE st3 (x int)")
    tabs2 = {
        r["table_name"]
        for r in es.sql(
            "SELECT table_name FROM information_schema.tables"
        ).collect()
    }
    assert "st3" in tabs2
    # SHOW TABLES (MySQL compat)
    shown = [r["table_name"] for r in es.sql("SHOW TABLES").collect()]
    assert shown == sorted(shown) and "st1" in shown
    # SHOW COLUMNS FROM t
    cols = [
        (r["field"], r["null"]) for r in es.sql("SHOW COLUMNS FROM st1").collect()
    ]
    assert cols == [("id", "YES"), ("name", "YES")]
    # SHOW SCHEMAS + PG-compat constants
    schemas = {r["schema_name"] for r in es.sql("SHOW SCHEMAS").collect()}
    assert "public" in schemas
    assert es.sql("SHOW SERVER_ENCODING").collect()[0]["server_encoding"] == "UTF8"
    assert (
        es.sql("SHOW TRANSACTION ISOLATION LEVEL").collect()[0][
            "transaction_isolation"
        ]
        == "read committed"
    )


def test_information_schema_extended_views(spark, tmp_path):
    es = EngineSession(spark, warehouse=str(tmp_path))
    es.sql("CREATE TABLE ise (id int PRIMARY KEY, v int NOT NULL)")
    es.sql("CREATE VIEW ise_v AS SELECT id FROM ise")
    es.sql("CREATE DOMAIN money AS decimal(10,2)")
    es.sql("CREATE USER alice PASSWORD 'x'")
    info = information_schema(es)
    assert {r["view_name"] for r in info["information_schema_views"].collect()} == {
        "ise_v"
    }
    assert {r["domain_name"] for r in info["information_schema_domains"].collect()} == {
        "money"
    }
    assert "alice" in {
        r["principal_name"] for r in info["information_schema_users"].collect()
    }
    cons = {
        (r["constraint_type"], r["definition"])
        for r in info["information_schema_constraints"]
        .filter("table_name = 'ise'")
        .collect()
    }
    assert ("NOT NULL", "v") in cons
    fns = dict(
        (r["function_name"], r["origin"])
        for r in info["information_schema_function_aliases"].collect()
    )
    assert fns["ABS"] == "BUILTIN" and "CANCEL_SESSION" in fns
    assert info["information_schema_type_info"].count() > 10
    assert info["information_schema_catalogs"].count() == 1
    srow = info["information_schema_sessions"].collect()[0]
    assert srow["session_id"] == spark.sparkContext.applicationId
    # all 13 meta views are SQL-queryable
    assert (
        es.sql("SELECT count(*) FROM information_schema_type_info").collect()[0][0]
        > 10
    )


def test_information_schema_complete_inventory(spark, tmp_path):
    """All 30 meta views of the reference exist (MetaTable.java:107,
    META_TABLE_TYPE_COUNT = 30) and the new 17 carry real catalog state."""
    es = EngineSession(spark, warehouse=str(tmp_path))
    es.sql("CREATE TABLE base (id int PRIMARY KEY, v int)")
    es.sql(
        "CREATE TABLE child (id int PRIMARY KEY, b_id int, "
        "CONSTRAINT fk_b FOREIGN KEY (b_id) REFERENCES base (id))"
    )
    es.sql("CREATE SCHEMA reporting AUTHORIZATION alice")
    es.sql("CREATE CONSTANT answer VALUE 42")
    es.sql("CREATE ROLE readers")
    es.sql("CREATE USER bob PASSWORD 'x'")
    es.sql("GRANT SELECT ON base TO bob")
    es.sql("CREATE TRIGGER trg AFTER INSERT ON base FOR EACH ROW CALL 'x'")
    es.sql("SET @who 'bob'")
    es.sql("SELECT count(*) AS n FROM base").collect()
    info = information_schema(es)
    # 30 reference meta views (MetaTable inventory) + the SERVICES
    # extension view
    assert len(info) == 31
    assert "information_schema_services" in info

    schemata = {
        r["schema_name"]: (r["schema_owner"], r["is_default"])
        for r in info["information_schema_schemata"].collect()
    }
    assert schemata["public"] == ("sa", True)
    assert schemata["reporting"] == ("alice", False)
    assert {r["type"] for r in info["information_schema_table_types"].collect()} == {
        "TABLE", "SYSTEM TABLE", "VIEW"
    }
    assert "readers" in {
        r["name"] for r in info["information_schema_roles"].collect()
    }
    assert ("bob", "SELECT", "base") in {
        (r["grantee"], r["rights"], r["table_name"])
        for r in info["information_schema_rights"].collect()
    }
    assert ("bob", "base", "SELECT") in {
        (r["grantee"], r["table_name"], r["privilege_type"])
        for r in info["information_schema_table_privileges"].collect()
    }
    cp = {
        (r["column_name"], r["privilege_type"])
        for r in info["information_schema_column_privileges"]
        .filter("table_name = 'base'")
        .collect()
    }
    assert ("id", "SELECT") in cp and ("v", "SELECT") in cp
    assert info["information_schema_collations"].count() >= 2
    helps = {r["topic"] for r in info["information_schema_help"].collect()}
    assert {"SELECT", "MERGE", "CREATE CONSTANT"} <= helps
    assert "trg" in {
        r["trigger_name"] for r in info["information_schema_triggers"].collect()
    }
    crow = info["information_schema_constants"].collect()[0]
    assert (crow["constant_name"], crow["sql"]) == ("answer", "42")
    xref = info["information_schema_cross_references"].collect()[0]
    assert (xref["pktable_name"], xref["pkcolumn_name"]) == ("base", "id")
    assert (xref["fktable_name"], xref["fkcolumn_name"]) == ("child", "b_id")
    assert xref["fk_name"] == "fk_b"
    qs = {
        r["sql_statement"]: r["execution_count"]
        for r in info["information_schema_query_statistics"].collect()
    }
    assert qs.get("SELECT count(*) AS n FROM base") == 1
    ss = {r["key"]: r["sql"] for r in info["information_schema_session_state"].collect()}
    assert ss.get("VARIABLE who") == "SET @who 'bob'"
    # empty-but-schema-correct surfaces
    assert info["information_schema_locks"].columns == [
        "table_schema", "table_name", "session_id", "lock_type"
    ]
    assert info["information_schema_in_doubt"].count() == 0
    assert info["information_schema_databases"].count() == 1
    # every view is SQL-queryable
    for name in info:
        es.sql(f"SELECT * FROM {name} LIMIT 1").collect()


# --- UDF adapter (CREATE ALIAS, §2.13) --------------------------------------
def test_create_alias_row_udf(spark):
    reg = UdfRegistry(spark)
    reg.create_alias("MY_REV", lambda s: s[::-1] if s else None, "string")
    assert (
        spark.sql("SELECT MY_REV('abc') AS r").collect()[0]["r"] == "cba"
    )


def test_create_alias_pandas_udf(spark):
    reg = UdfRegistry(spark)
    reg.create_alias(
        "PLUS_TEN", lambda s: s + 10, "long", vectorized=True
    )
    got = spark.range(3).selectExpr("PLUS_TEN(id) AS v").collect()
    assert [r["v"] for r in got] == [10, 11, 12]


# --- UDAF adapter (CREATE AGGREGATE 4-method protocol) ----------------------
class Median(AggregateFunction):
    """Sample aggregate exercising the reference protocol
    (api/AggregateFunction.java:16-50)."""

    def init(self):
        self.values = []

    def get_type(self, arg_types):
        return "double"

    def add(self, value):
        if value is not None:
            self.values.append(float(value))

    def get_result(self):
        if not self.values:
            return None
        s = sorted(self.values)
        n = len(s)
        mid = n // 2
        return s[mid] if n % 2 else (s[mid - 1] + s[mid]) / 2.0


def test_create_aggregate_grouped(spark):
    reg = UdfRegistry(spark)
    reg.create_aggregate("MEDIAN", Median)
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 9.0), ("a", 5.0), ("b", 2.0), ("b", 4.0)],
        "k string, v double",
    )
    got = {
        r["k"]: r["median"]
        for r in reg.apply_aggregate("MEDIAN", df, "v", group_by=["k"]).collect()
    }
    assert got == {"a": 5.0, "b": 3.0}


def test_create_aggregate_global(spark):
    reg = UdfRegistry(spark)
    reg.create_aggregate("MEDIAN", Median)
    df = spark.createDataFrame([(x,) for x in [3.0, 1.0, 2.0]], "v double")
    assert reg.apply_aggregate("MEDIAN", df, "v").collect()[0]["median"] == 2.0


# --- streaming --------------------------------------------------------------
@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    """Copy the events table into a dir the file-source can tail."""
    from etl_lealone_spark.tables import load_table

    d = tmp_path_factory.mktemp("events_stream")
    # load_table converts the nanos-long ts to a real timestamp column
    load_table(spark, sf_dir, "events").coalesce(2).write.mode(
        "overwrite"
    ).parquet(str(d / "in"))
    return str(d / "in")


def _run_to_completion(stream_df, name, mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_streaming_tumbling_agg_matches_batch(spark, events_stream_dir, tables):
    stream = stream_from_parquet_dir(spark, events_stream_dir)
    _run_to_completion(
        streaming_tumbling_agg(stream), "stream_agg", mode="complete"
    )
    got = spark.sql("SELECT sum(n) AS total FROM stream_agg").collect()[0]["total"]
    assert got == tables["events"].count()


def test_streaming_dedup(spark, events_stream_dir):
    docs = stream_from_parquet_dir(
        spark,
        events_stream_dir,
    ).selectExpr("event_id AS doc_id", "props AS text")
    _run_to_completion(streaming_dedup(docs), "stream_dedup")
    n_distinct = (
        spark.sql("SELECT count(DISTINCT text) AS n FROM stream_dedup")
        .collect()[0]["n"]
    )
    total = spark.sql("SELECT count(*) AS n FROM stream_dedup").collect()[0]["n"]
    assert total == n_distinct  # every surviving doc is unique content


def test_sessionize_stream(spark, events_stream_dir):
    stream = stream_from_parquet_dir(spark, events_stream_dir)
    _run_to_completion(sessionize_stream(stream), "stream_sessions")
    rows = spark.sql(
        "SELECT count(*) AS n FROM stream_sessions WHERE session_end < session_start"
    ).collect()
    assert rows[0]["n"] == 0
    assert spark.sql("SELECT count(*) AS n FROM stream_sessions").collect()[0]["n"] > 0


def test_create_table_alias_udtf(spark, tables):
    reg = UdfRegistry(spark)

    def top_docs(n: int):
        return tables["documents"].orderBy("doc_id").limit(n).select("doc_id", "lang")

    reg.create_table_alias("TOP_DOCS", top_docs)
    df = reg.call_table("TOP_DOCS", 5)
    assert df.count() == 5
    # usable in FROM after registration (UDTF-in-FROM parity,
    # FunctionTable.java:33)
    assert spark.sql("SELECT count(*) AS n FROM top_docs").collect()[0]["n"] == 5


def test_python_udtf_in_from(spark):
    """True Python UDTF (Spark 3.5+): class-based, callable in FROM with
    arguments — the full-fidelity FunctionTable parity path."""
    reg = UdfRegistry(spark)

    class SeriesWithSquares:
        def eval(self, n: int):
            for i in range(n):
                yield (i, i * i)

    reg.create_udtf("SERIES_SQ", SeriesWithSquares, "i int, sq int")
    rows = spark.sql("SELECT * FROM SERIES_SQ(4) ORDER BY i").collect()
    assert [(r["i"], r["sq"]) for r in rows] == [(0, 0), (1, 1), (2, 4), (3, 9)]
    # works with a LATERAL join against a real table
    out = spark.sql(
        "SELECT t.id, s.sq FROM VALUES (2), (3) AS t(id), "
        "LATERAL SERIES_SQ(t.id) AS s ORDER BY t.id, s.sq"
    ).collect()
    assert len(out) == 5


def test_running_user_totals_stateful(spark, events_stream_dir, tables):
    from etl_lealone_spark.streaming import running_user_totals

    stream = stream_from_parquet_dir(spark, events_stream_dir)
    _run_to_completion(running_user_totals(stream), "stream_totals", mode="append")
    # the LAST emitted row per user carries the cumulative count; the
    # per-user max must equal the batch ground truth
    got = spark.sql(
        "SELECT user_id, max(n_events) AS n FROM stream_totals GROUP BY user_id"
    )
    truth = tables["events"].groupBy("user_id").count()
    joined = got.join(truth, "user_id")
    assert joined.filter("n <> count").count() == 0
    assert joined.count() == truth.count()


def test_enrich_stream_static_join(spark, events_stream_dir, tables):
    from etl_lealone_spark.streaming import enrich_stream

    stream = stream_from_parquet_dir(spark, events_stream_dir)
    dim = (
        tables["events"]
        .select("user_id")
        .distinct()
        .withColumn("user_tag", F.concat(F.lit("u"), F.col("user_id")))
    )
    _run_to_completion(
        enrich_stream(stream, dim, on="user_id"), "stream_enriched"
    )
    out = spark.sql(
        "SELECT count(*) AS n, count(user_tag) AS tagged FROM stream_enriched"
    ).collect()[0]
    assert out["n"] == tables["events"].count()
    assert out["tagged"] == out["n"]  # every event matched its dimension row


def test_streaming_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode windowed agg: rows older than the watermark are
    dropped, and a closed window's count excludes them."""
    from pyspark.sql import Row

    src = tmp_path / "late_in"
    src.mkdir()

    from etl_lealone_spark.streaming.ingest import EVENTS_SCHEMA as _SCHEMA

    def write_file(name, rows):
        spark.createDataFrame(
            [Row(event_id=i, ts=ts, user_id=1, event_type="a", value=1.0,
                 props="{}") for i, ts in rows],
            _SCHEMA,
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))

    from datetime import datetime

    t = lambda h, m=0: datetime(2024, 1, 1, h, m)  # noqa: E731

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    agg = streaming_tumbling_agg(stream, window="1 hour", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_agg")
        .outputMode("append")
        .start()
    )
    try:
        # batch 1: two rows in the 10:00 window -> watermark to 09:30
        write_file("f1", [(1, t(10, 0)), (2, t(10, 30))])
        q.processAllAvailable()
        # batch 2: a LATE row at 05:00 (far below watermark) -> dropped
        write_file("f2", [(3, t(5, 0))])
        q.processAllAvailable()
        # batch 3: advance event time so the 10:00 window closes and emits
        write_file("f3", [(4, t(13, 0))])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        r["window_start"]: r["n"]
        for r in spark.sql("SELECT * FROM late_agg").collect()
    }
    assert rows.get(t(10)) == 2       # closed window: late row NOT counted
    assert t(5) not in rows           # late row never forms a window


def test_upsert_sink_foreachbatch(spark, tmp_path):
    from etl_lealone_spark.operators.dml import SnapshotTable
    from etl_lealone_spark.streaming import upsert_sink

    from pyspark.sql import Row

    tbl = SnapshotTable(spark, str(tmp_path / "tables"), "user_scores")
    tbl.write(
        spark.createDataFrame(
            [Row(user_id=1, score=10), Row(user_id=2, score=20)],
            "user_id long, score long",
        )
    )
    src = tmp_path / "upsert_in"
    src.mkdir()
    schema = "user_id long, score long"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = upsert_sink(
        stream, tbl, keys=["user_id"],
        checkpoint_dir=str(tmp_path / "ckpt"), query_name="upsert_q",
    )
    try:
        spark.createDataFrame(
            [Row(user_id=2, score=25), Row(user_id=3, score=30)], schema
        ).coalesce(1).write.mode("overwrite").parquet(str(src / "f1"))
        q.processAllAvailable()
        spark.createDataFrame(
            [Row(user_id=3, score=35)], schema
        ).coalesce(1).write.mode("overwrite").parquet(str(src / "f2"))
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["user_id"]: r["score"] for r in tbl.read().collect()}
    assert got == {1: 10, 2: 25, 3: 35}  # untouched, updated, upserted-twice


def test_jsonl_roundtrip(spark, tmp_path, tables):
    from etl_lealone_spark.sources import jsonlread, jsonlwrite

    d = tables["documents"].select("doc_id", "lang", "text").limit(100)
    out = str(tmp_path / "docs_jsonl")
    jsonlwrite(d, out)
    back = jsonlread(
        spark, out, schema="doc_id long, lang string, text string"
    )
    assert back.count() == 100
    assert back.exceptAll(d).isEmpty() and d.exceptAll(back).isEmpty()


def test_jsonl_corrupt_record_permissive(spark, tmp_path):
    from etl_lealone_spark.sources import jsonlread

    p = tmp_path / "bad.jsonl"
    p.write_text('{"a": 1}\nNOT JSON\n{"a": 3}\n')
    df = jsonlread(
        spark, str(p), schema="a long, _corrupt_record string"
    ).cache()
    try:
        assert df.count() == 3
        assert df.filter("_corrupt_record IS NOT NULL").count() == 1
        assert df.filter("a IS NOT NULL").count() == 2
    finally:
        df.unpersist()


def test_orc_roundtrip(spark, tmp_path, tables):
    """ORC source/sink: Spark-native columnar alternative to parquet —
    pushdown + pruning come from the same data-source framework."""
    d = tables["orders"].select("o_orderkey", "o_totalprice", "o_orderstatus")
    out = str(tmp_path / "orders_orc")
    d.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.count() == d.count()
    got = back.agg(F.sum(F.col("o_totalprice").cast("decimal(28,2)")).alias("s")
                   ).collect()[0]["s"]
    want = d.agg(F.sum(F.col("o_totalprice").cast("decimal(28,2)")).alias("s")
                 ).collect()[0]["s"]
    assert got == want


# --- sliding windows + stream-stream join -----------------------------------
def test_streaming_sliding_agg_matches_batch(spark, events_stream_dir, tables):
    """Sliding windows: the streaming result in complete mode must equal
    the batch groupBy(window(slide)) twin bucket-for-bucket."""
    from etl_lealone_spark.streaming import streaming_sliding_agg

    stream = stream_from_parquet_dir(spark, events_stream_dir)
    _run_to_completion(
        streaming_sliding_agg(stream, window="1 hour", slide="30 minutes"),
        "stream_sliding",
        mode="complete",
    )
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM stream_sliding").collect()
    }
    batch = (
        tables["events"]
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("tv"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n", "tv")
    )
    want = {(r.ws, r.event_type): (r.n, r.tv) for r in batch.collect()}
    assert got == want
    # every event lands in window/slide = 2 overlapping windows
    assert sum(n for (n, _) in got.values()) == 2 * tables["events"].count()


def test_join_streams_interval_matches_batch(spark, sf_dir, tables, tmp_path):
    """Stream-stream interval join processed as one micro-batch must
    equal the identical batch join (no expiry inside a single batch)."""
    from etl_lealone_spark.streaming import join_streams_interval
    from etl_lealone_spark.streaming.ingest import EVENTS_SCHEMA
    from etl_lealone_spark.tables import load_table

    d = str(tmp_path / "ss_in")
    ev = load_table(spark, sf_dir, "events")
    ev.coalesce(1).write.mode("overwrite").parquet(d)
    clicks_s = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(d)
        .filter(F.col("event_type") == "click")
    )
    buys_s = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(d)
        .filter(F.col("event_type") == "purchase")
    )
    _run_to_completion(
        join_streams_interval(clicks_s, buys_s, within="30 minutes"),
        "stream_ssjoin",
    )
    got = spark.sql("SELECT count(*) AS n FROM stream_ssjoin").collect()[0]["n"]

    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("k"), F.col("ts").alias("l_ts")
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_k"), F.col("ts").alias("r_ts")
    )
    want = c.join(
        b,
        (F.col("k") == F.col("r_k"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).count()
    assert got == want and got > 0


def test_join_streams_left_outer_emits_unmatched(spark, tmp_path):
    """Left-outer stream-stream join: unmatched left rows emit with null
    right columns AFTER the watermark passes their join window (batch 2
    carries a far-future event that advances the watermark)."""
    import datetime as dt

    from etl_lealone_spark.streaming import join_streams_interval
    from etl_lealone_spark.streaming.ingest import EVENTS_SCHEMA

    d = str(tmp_path / "lo_in")

    def mk(rows):
        return spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1)

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    # batch 1: two clicks, one matching purchase (user 1)
    mk([
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0, 2, "click", 1.0, "{}"),
        (3, t0 + dt.timedelta(minutes=5), 1, "purchase", 1.0, "{}"),
    ]).write.mode("overwrite").parquet(d)
    clicks = (
        spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", 1)
        .parquet(d).filter(F.col("event_type") == "click")
    )
    buys = (
        spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", 1)
        .parquet(d).filter(F.col("event_type") == "purchase")
    )
    joined = join_streams_interval(
        clicks, buys, within="30 minutes", watermark="10 minutes",
        how="left_outer",
    )
    q = (
        joined.writeStream.format("memory").queryName("stream_lojoin")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        # batches 2-3: far-future watermark pushers — the watermark
        # advances at the END of a batch, and evicted outer rows emit in
        # the NEXT batch, so two nudges are needed
        # the engine's global watermark is the MIN across inputs, so
        # each nudge must advance BOTH streams
        for day, eid in ((2, 99), (3, 101)):
            mk([
                (eid, t0 + dt.timedelta(days=day), 9, "click", 1.0, "{}"),
                (eid + 1, t0 + dt.timedelta(days=day), 9, "purchase", 1.0, "{}"),
            ]).write.mode("append").parquet(d)
            q.processAllAvailable()
    finally:
        q.stop()
    rows = {r.user_id: r for r in spark.sql("SELECT * FROM stream_lojoin").collect()}
    assert rows[1].r_event_id == 3  # matched pair
    assert 2 in rows and rows[2].r_event_id is None  # expired unmatched left
