"""CREATE ALIAS / CREATE AGGREGATE SQL surface (SURVEY.md §2.13).

Reference: ddl/CreateFunctionAlias.java:25 (FOR "class.method" + inline
``AS`` source), ddl/CreateAggregate.java, ddl/DropFunctionAlias.java,
api/AggregateFunction.java:16-50 (4-method protocol), and the dialect
mapping documented in catalog.py:_create_alias — Java Math methods
rewrite to Spark builtins (zero UDF cost), python dotted paths register
as UDFs, inline source is exec'd like the reference compiles inline Java.
"""

from __future__ import annotations

import pytest

from etl_lealone_spark.session import EngineSession


@pytest.fixture()
def es(spark, tmp_path):
    s = EngineSession(spark, warehouse=str(tmp_path / "wh"))
    s.sql("CREATE TABLE t (id int PRIMARY KEY, name varchar(30), amt double)")
    s.sql(
        "INSERT INTO t VALUES (1, 'Hello World', 1.0), (2, 'Spark SQL!', 4.0), "
        "(3, 'a b c', 9.0), (4, NULL, 16.0)"
    )
    return s


# -- FOR "java.lang.Math.x" → builtin rewrite ----------------------------
def test_alias_java_math_builtin_rewrite(es):
    es.sql('CREATE ALIAS MSQRT FOR "java.lang.Math.sqrt"')
    got = es.sql("SELECT id, MSQRT(amt) AS r FROM t ORDER BY id").collect()
    assert [r["r"] for r in got] == [1.0, 2.0, 3.0, 4.0]
    # rewrite happens pre-parse: the plan must contain no Python eval node
    plan = es.sql("SELECT MSQRT(amt) AS r FROM t")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_alias_if_not_exists_and_duplicate(es):
    es.sql('CREATE ALIAS MABS FOR "java.lang.Math.abs"')
    assert (
        es.sql('CREATE ALIAS IF NOT EXISTS MABS FOR "java.lang.Math.abs"')
        .collect()[0]["status"]
        == "exists"
    )
    with pytest.raises(ValueError):
        es.sql('CREATE ALIAS MABS FOR "java.lang.Math.abs"')


# -- FOR "python.dotted.path" -------------------------------------------
def test_alias_python_dotted_path(es):
    es.sql('CREATE ALIAS SLUG FOR "etl_lealone_spark.functions.examples.slugify"')
    got = es.sql("SELECT id, SLUG(name) AS s FROM t ORDER BY id").collect()
    assert [r["s"] for r in got] == ["hello-world", "spark-sql", "a-b-c", None]


def test_alias_bad_target(es):
    with pytest.raises(ValueError):
        es.sql('CREATE ALIAS NOPE FOR "no.such.module.fn"')


# -- inline AS '<source>' (reference compiles inline Java the same way) --
def test_alias_inline_source(es):
    es.sql(
        "CREATE ALIAS SHOUT AS 'def shout(s: str) -> str:\n"
        "    return None if s is None else s.upper() + \"!\"'"
    )
    got = es.sql("SELECT SHOUT(name) AS s FROM t WHERE id = 1").collect()
    assert got[0]["s"] == "HELLO WORLD!"


def test_alias_inline_dollar_quoted_int(es):
    es.sql(
        "CREATE ALIAS TWICE AS $$def twice(x: int) -> int:\n    return x * 2$$"
    )
    assert es.sql("SELECT TWICE(id) AS v FROM t WHERE id = 3").collect()[0]["v"] == 6


# -- DROP ALIAS ----------------------------------------------------------
def test_drop_alias(es):
    es.sql('CREATE ALIAS GONE FOR "java.lang.Math.sqrt"')
    es.sql("DROP ALIAS GONE")
    assert "GONE" not in es.fn_alias_builtins
    with pytest.raises(KeyError):
        es.sql("DROP ALIAS GONE")
    es.sql("DROP ALIAS IF EXISTS GONE")  # no error


# -- CREATE AGGREGATE ----------------------------------------------------
def test_create_aggregate_sql_groupby(es):
    es.sql('CREATE AGGREGATE MEDIAN FOR "etl_lealone_spark.functions.examples.Median"')
    es.sql("CREATE TABLE g (k int, v double)")
    es.sql("INSERT INTO g VALUES (1, 1.0), (1, 2.0), (1, 9.0), (2, 5.0), (2, 7.0)")
    got = es.sql("SELECT k, MEDIAN(v) AS m FROM g GROUP BY k ORDER BY k").collect()
    assert [(r["k"], r["m"]) for r in got] == [(1, 2.0), (2, 6.0)]
    with pytest.raises(ValueError):
        es.sql('CREATE AGGREGATE MEDIAN FOR "etl_lealone_spark.functions.examples.Median"')
    es.sql("DROP AGGREGATE MEDIAN")
    assert "MEDIAN" not in es.udfs.aggregates


# -- SCRIPT round-trip ---------------------------------------------------
def test_script_includes_alias_ddl(es, spark, tmp_path):
    es.sql('CREATE ALIAS MSQ FOR "java.lang.Math.sqrt"')
    es.sql('CREATE AGGREGATE MED2 FOR "etl_lealone_spark.functions.examples.Median"')
    script = [r["script"] for r in es.sql("SCRIPT").collect()]
    assert any("CREATE ALIAS MSQ" in s for s in script)
    assert any("CREATE AGGREGATE MED2" in s for s in script)
    # replay into a fresh session: alias works there too
    es2 = EngineSession(spark, warehouse=str(tmp_path / "wh2"))
    for stmt in script:
        if not stmt.startswith("--"):
            es2.sql(stmt)
    assert es2.sql("SELECT MSQ(9.0) AS r").collect()[0]["r"] == 3.0


# -- INFORMATION_SCHEMA.FUNCTION_ALIASES ---------------------------------
def test_info_schema_lists_aliases(es):
    es.sql('CREATE ALIAS FSQ FOR "java.lang.Math.sqrt"')
    es.sql('CREATE AGGREGATE FMED FOR "etl_lealone_spark.functions.examples.Median"')
    rows = es.sql(
        "SELECT origin FROM INFORMATION_SCHEMA.FUNCTION_ALIASES "
        "WHERE function_name IN ('FSQ', 'FMED')"
    ).collect()
    assert sorted(r["origin"] for r in rows) == ["AGGREGATE", "ALIAS"]
