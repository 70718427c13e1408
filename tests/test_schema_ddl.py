"""Schema-level DDL + catalog-object surface (VERDICT r1 items 6/7/9):
CREATE/DROP SCHEMA (reference ddl/CreateSchema.java), CREATE/DROP CONSTANT
(CreateConstant.java), ALTER TABLE ALTER COLUMN (AlterTableAlterColumn.java),
ALTER SEQUENCE (AlterSequence.java), ALTER VIEW (AlterView.java),
GRANT/COMMENT recording, and the SCRIPT → RUNSCRIPT round-trip
(Script.java / RunScript.java)."""

from __future__ import annotations

import pytest

from etl_lealone_spark.session import EngineSession


@pytest.fixture()
def es(spark, tmp_path):
    s = EngineSession(spark, warehouse=str(tmp_path / "wh"))
    s.sql("CREATE TABLE t (id int PRIMARY KEY, name varchar(20), amt double)")
    s.sql("INSERT INTO t VALUES (1, 'x', 1.5), (2, 'y', 2.5)")
    return s


# -- CREATE / DROP SCHEMA ------------------------------------------------
def test_create_drop_schema(es):
    es.sql("CREATE SCHEMA analytics AUTHORIZATION alice")
    assert es.catalog.schemas["analytics"] == "alice"
    assert es.sql("CREATE SCHEMA IF NOT EXISTS analytics").collect()[0][
        "status"
    ] == "exists"
    with pytest.raises(ValueError):
        es.sql("CREATE SCHEMA analytics")
    es.sql("DROP SCHEMA analytics")
    assert "analytics" not in es.catalog.schemas
    with pytest.raises(KeyError):
        es.sql("DROP SCHEMA analytics")
    es.sql("DROP SCHEMA IF EXISTS analytics")  # no error
    with pytest.raises(ValueError):
        es.sql("DROP SCHEMA public")


# -- CREATE / DROP CONSTANT ---------------------------------------------
def test_constant_substitution(es):
    es.sql("CREATE CONSTANT max_amt VALUE 2.0")
    got = es.sql("SELECT id FROM t WHERE amt > max_amt").collect()
    assert [r["id"] for r in got] == [2]
    # constants participate in expressions
    assert es.sql("SELECT max_amt * 10 AS v").collect()[0]["v"] == 20.0
    es.sql("DROP CONSTANT max_amt")
    assert "max_amt" not in es.catalog.constants
    with pytest.raises(Exception):
        es.sql("SELECT max_amt AS v").collect()


def test_constant_string_value(es):
    es.sql("CREATE CONSTANT greeting VALUE 'hello'")
    assert es.sql("SELECT greeting AS g").collect()[0]["g"] == "hello"


# -- ALTER TABLE ALTER COLUMN -------------------------------------------
def test_alter_column_type_change(es):
    es.sql("ALTER TABLE t ALTER COLUMN amt decimal(10, 2)")
    field = {f.name: f for f in es.sql("SELECT * FROM t").schema.fields}["amt"]
    assert field.dataType.simpleString() == "decimal(10,2)"
    assert es.sql("SELECT amt FROM t WHERE id = 1").collect()[0][0] == 1.5


def test_alter_column_set_data_type(es):
    es.sql("ALTER TABLE t ALTER COLUMN id SET DATA TYPE bigint")
    field = {f.name: f for f in es.sql("SELECT * FROM t").schema.fields}["id"]
    assert field.dataType.simpleString() == "bigint"


def test_alter_column_rename(es):
    es.sql("ALTER TABLE t ALTER COLUMN name RENAME TO label")
    assert "label" in es.sql("SELECT * FROM t").columns


def test_alter_column_default_and_not_null(es):
    es.sql("ALTER TABLE t ALTER COLUMN name SET DEFAULT 'n/a'")
    assert es.catalog.constraints["t"].defaults["name"] == "'n/a'"
    es.sql("INSERT INTO t (id, amt) VALUES (3, 9.0)")
    assert (
        es.sql("SELECT name FROM t WHERE id = 3").collect()[0][0] == "n/a"
    )
    es.sql("ALTER TABLE t ALTER COLUMN name DROP DEFAULT")
    assert "name" not in es.catalog.constraints["t"].defaults
    es.sql("ALTER TABLE t ALTER COLUMN name SET NOT NULL")
    assert "name" in es.catalog.constraints["t"].not_null
    with pytest.raises(Exception):
        es.sql("INSERT INTO t (id, amt) VALUES (4, 1.0)")  # name now NULL
    es.sql("ALTER TABLE t ALTER COLUMN name DROP NOT NULL")
    assert "name" not in es.catalog.constraints["t"].not_null


def test_alter_column_set_not_null_rejects_existing_nulls(es):
    es.sql("ALTER TABLE t ADD COLUMN extra varchar(10)")
    with pytest.raises(ValueError):
        es.sql("ALTER TABLE t ALTER COLUMN extra SET NOT NULL")


# -- ALTER SEQUENCE / ALTER VIEW ----------------------------------------
def test_alter_sequence(es):
    es.sql("CREATE SEQUENCE sq START WITH 5 INCREMENT BY 1")
    assert es.sql("SELECT NEXTVAL('sq') AS v").collect()[0]["v"] == 5
    es.sql("ALTER SEQUENCE sq RESTART WITH 100 INCREMENT BY 10")
    assert es.sql("SELECT NEXTVAL('sq') AS v").collect()[0]["v"] == 100
    assert es.sql("SELECT NEXTVAL('sq') AS v").collect()[0]["v"] == 110
    with pytest.raises(KeyError):
        es.sql("ALTER SEQUENCE nope RESTART WITH 1")


def test_alter_view(es):
    es.sql("CREATE VIEW v1 AS SELECT id FROM t WHERE id = 1")
    assert es.sql("SELECT count(*) AS n FROM v1").collect()[0]["n"] == 1
    es.sql("ALTER VIEW v1 AS SELECT id FROM t")
    assert es.sql("SELECT count(*) AS n FROM v1").collect()[0]["n"] == 2
    es.sql("ALTER VIEW v1 RECOMPILE")  # no-op re-resolution
    assert es.sql("SELECT count(*) AS n FROM v1").collect()[0]["n"] == 2


# -- GRANT / REVOKE / COMMENT recording ---------------------------------
def test_grant_revoke_recorded(es):
    es.sql("CREATE USER bob PASSWORD 'pw'")
    es.sql("GRANT SELECT ON t TO bob")
    assert ("bob", "SELECT", "t") in es.catalog.grants
    es.sql("REVOKE SELECT ON t FROM bob")
    assert ("bob", "SELECT", "t") not in es.catalog.grants
    es.sql("CREATE ROLE readers")
    es.sql("GRANT readers TO bob")
    assert ("bob", "ROLE", "readers") in es.catalog.grants


def test_comment_recorded(es):
    es.sql("COMMENT ON TABLE t IS 'fact table'")
    assert es.catalog.comments["t"] == "fact table"
    es.sql("COMMENT ON COLUMN t.amt IS 'usd'")
    assert es.catalog.comments["t.amt"] == "usd"
    es.sql("COMMENT ON TABLE t IS NULL")
    assert "t" not in es.catalog.comments


# -- foreign keys parsed into catalog metadata --------------------------
def test_foreign_key_metadata(es):
    es.sql(
        "CREATE TABLE child (id int PRIMARY KEY, t_id int, "
        "CONSTRAINT fk_t FOREIGN KEY (t_id) REFERENCES t (id))"
    )
    fks = es.catalog.constraints["child"].foreign_keys
    assert fks == [("fk_t", ["t_id"], "t", ["id"])]


# -- SCRIPT round-trip fidelity (Script.java surface) -------------------
def test_script_roundtrip(es, spark, tmp_path):
    es.sql("CREATE SCHEMA extra AUTHORIZATION sa")
    es.sql("CREATE SEQUENCE sq START WITH 41 INCREMENT BY 2")
    es.sql("SELECT NEXTVAL('sq') AS v").collect()  # bump → current = 43
    es.sql("CREATE CONSTANT pi_ish VALUE 3.14")
    es.sql("CREATE DOMAIN email AS varchar(100)")
    es.sql("CREATE INDEX idx_amt ON t (amt)")
    es.sql("CREATE VIEW big AS SELECT id FROM t WHERE amt > 2")
    es.sql("CREATE USER carol PASSWORD 'x'")
    es.sql("GRANT SELECT ON t TO carol")
    es.sql("COMMENT ON TABLE t IS 'demo'")

    path = tmp_path / "dump.sql"
    es.sql(f"SCRIPT TO '{path}'")
    text = path.read_text()
    assert "CREATE CONSTANT pi_ish VALUE 3.14" in text
    assert "CREATE SCHEMA IF NOT EXISTS extra" in text
    assert "START WITH 43" in text  # sequence current value, not origin

    fresh = EngineSession(spark, warehouse=str(tmp_path / "wh2"))
    fresh.sql(f"RUNSCRIPT FROM '{path}'")
    # data round-trips
    rows = fresh.sql("SELECT id, name, amt FROM t ORDER BY id").collect()
    assert [(r["id"], r["name"], r["amt"]) for r in rows] == [
        (1, "x", 1.5),
        (2, "y", 2.5),
    ]
    # catalog objects round-trip
    assert fresh.catalog.schemas["extra"] == "sa"
    assert fresh.catalog.constants["pi_ish"] == "3.14"
    assert fresh.catalog.domains["email"] == "string"
    assert fresh.catalog.indexes["idx_amt"].columns == ["amt"]
    assert "carol" in fresh.catalog.principals
    assert ("carol", "SELECT", "t") in fresh.catalog.grants
    assert fresh.catalog.comments["t"] == "demo"
    assert fresh.sql("SELECT count(*) AS n FROM big").collect()[0]["n"] == 1
    # sequence resumes where the dump left off
    assert fresh.sql("SELECT NEXTVAL('sq') AS v").collect()[0]["v"] == 43
    # constants resolve in the fresh session (Spark parses 3.14 as DECIMAL)
    assert float(fresh.sql("SELECT pi_ish AS v").collect()[0]["v"]) == 3.14


def test_script_nodata(es):
    rows = [r["script"] for r in es.sql("SCRIPT NODATA").collect()]
    assert any(r.startswith("CREATE") for r in rows)
    assert not any(r.startswith("INSERT") for r in rows)


def test_script_data_dump_streams(es, tmp_path, monkeypatch):
    """The data dump must never df.collect() a whole table to the driver
    (lake-scale tables would OOM it) — it streams via toLocalIterator.
    Poison collect() during the dump to prove the path is never taken."""
    from pyspark.sql import DataFrame

    def _no_collect(self):
        raise AssertionError("SCRIPT dump called DataFrame.collect()")

    path = tmp_path / "dump_stream.sql"
    monkeypatch.setattr(DataFrame, "collect", _no_collect)
    es.sql(f"SCRIPT TO '{path}'")
    monkeypatch.undo()
    text = path.read_text()
    assert "INSERT INTO t (id, name, amt) VALUES (1, 'x', 1.5)" in text
    assert text.index("CREATE TABLE") < text.index("INSERT INTO t")


def test_drop_all_objects(es):
    es.sql("CREATE SEQUENCE sq_all START WITH 1")
    es.sql("CREATE CONSTANT c_all VALUE 1")
    es.sql("CREATE VIEW v_all AS SELECT id FROM t")
    es.sql("DROP ALL OBJECTS")
    assert not es.catalog.tables and not es.catalog.views
    assert not es.catalog.constants and not es.sequences
    assert es.catalog.schemas == {"public": "sa"}
    with pytest.raises(Exception):
        es.sql("SELECT * FROM t").collect()


def test_backup_restore(es, spark, tmp_path):
    """BACKUP TO 'x.zip' (Backup.java): zip of the warehouse; unzipping
    into a fresh warehouse restores every table's snapshot tree."""
    import shutil

    zip_path = tmp_path / "bk.zip"
    out = es.sql(f"BACKUP TO '{zip_path}'").collect()[0]["status"]
    assert "backup written" in out and zip_path.exists()
    restored = tmp_path / "restored"
    shutil.unpack_archive(str(zip_path), str(restored))
    fresh = EngineSession(spark, warehouse=str(restored))
    from etl_lealone_spark.operators.dml import SnapshotTable

    st = SnapshotTable(spark, str(restored), "t")
    fresh.catalog.tables["t"] = st
    fresh.catalog.refresh_view("t")
    rows = fresh.sql("SELECT id, name FROM t ORDER BY id").collect()
    assert [(r["id"], r["name"]) for r in rows] == [(1, "x"), (2, "y")]


def test_set_collation_icu(spark, tmp_path):
    """SET COLLATION (Set.java COLLATION branch / CompareModeIcu4J):
    maps to Spark 4 native ICU collations; applies to varchar columns
    of tables created afterwards. Reference parity: rejected once any
    user table exists (Set.java:87-90,
    COLLATION_CHANGE_WITH_DATA_TABLE_1), so the session starts empty."""
    from etl_lealone_spark.session import EngineSession

    es = EngineSession(spark, warehouse=str(tmp_path / "wh_coll"))
    es.sql("SET COLLATION GERMAN STRENGTH SECONDARY")  # de_CI
    assert es.collation == "de_CI"
    es.sql("CREATE TABLE de_words (id int PRIMARY KEY, w varchar(20))")
    es.sql("INSERT INTO de_words VALUES (1,'Straße'), (2,'STRASSE'), (3,'x')")
    # case-insensitive German compare
    got = sorted(
        r["id"] for r in es.sql("SELECT id FROM de_words WHERE w = 'straße'").collect()
    )
    assert 1 in got
    # reference parity: changing collation with a data table present is
    # rejected (COLLATION_CHANGE_WITH_DATA_TABLE_1)
    with pytest.raises(ValueError, match="data table exists"):
        es.sql("SET COLLATION FRENCH STRENGTH PRIMARY")
    es.sql("DROP TABLE de_words")
    # strength PRIMARY also ignores accents
    es.sql("SET COLLATION FRENCH STRENGTH PRIMARY")
    assert es.collation == "fr_CI_AI"
    es.sql("CREATE TABLE fr_words (id int PRIMARY KEY, w varchar(20))")
    es.sql("INSERT INTO fr_words VALUES (1,'élève'), (2,'ELEVE')")
    got = {r["id"] for r in es.sql("SELECT id FROM fr_words WHERE w = 'eleve'").collect()}
    assert got == {1, 2}
    # OFF restores binary for new tables (again: only on an empty catalog)
    es.sql("DROP TABLE fr_words")
    es.sql("SET COLLATION OFF")
    assert es.collation is None
    with pytest.raises(ValueError):
        es.sql("SET COLLATION KLINGON")


def test_collation_icu4j_prefix_maps_to_locale():
    """ICU4J_<locale> names (reference CompareModeIcu4J) map to the
    prefix-stripped ICU locale, not a bogus 'icu4j_*' id (r6 review)."""
    from etl_lealone_spark.catalog import collation_to_spark

    assert collation_to_spark("ICU4J_EN") == "en"
    assert collation_to_spark("ICU4J_GERMAN", "SECONDARY") == "de_CI"
    assert collation_to_spark("ICU4J_PT_BR") == "pt_BRA"
    assert collation_to_spark("OFF") is None


def test_collation_locale_variants_map_to_spark_ids():
    """Reference CompareModeIcu4J accepts arbitrary ICU locale ids
    (`de_AT`, `zh_Hant`); Spark 4 wants alpha-3 countries and
    title-case script subtags — the mapping must bridge both forms."""
    from etl_lealone_spark.catalog import collation_to_spark

    assert collation_to_spark("de_AT") == "de_AUT"
    assert collation_to_spark("DE_AT", "PRIMARY") == "de_AUT_CI_AI"
    assert collation_to_spark("fr_CA", "SECONDARY") == "fr_CAN_CI"
    assert collation_to_spark("zh_Hant") == "zh_Hant"
    assert collation_to_spark("ZH_HANT") == "zh_Hant"
    assert collation_to_spark("sr_Cyrl_RS") == "sr_Cyrl_SRB"
    assert collation_to_spark("de_AUT") == "de_AUT"  # alpha-3 passthrough


def test_column_collate_passthrough_locale_and_misparse_guards(es):
    """A non-mapped pass-through locale (`de_AT`) orders correctly in
    DDL; COLLATE tokens inside a DEFAULT string literal or CHECK
    expression are NOT misparsed as column collations; unknown locales
    still fail typed at CREATE time (r6 advice + verdict task 6)."""
    es.sql(
        "CREATE TABLE at_sorted (id int PRIMARY KEY, "
        "w varchar(20) COLLATE de_AT)"
    )
    es.sql("INSERT INTO at_sorted VALUES (1,'zebra'), (2,'ähre'), (3,'apfel')")
    got = [r["w"] for r in es.sql("SELECT w FROM at_sorted ORDER BY w").collect()]
    assert got == ["ähre", "apfel", "zebra"]  # ICU de_AT, not binary
    # a COLLATE inside a DEFAULT literal must stay a literal (binary order)
    es.sql(
        "CREATE TABLE lit_w (id int PRIMARY KEY, "
        "w varchar(40) DEFAULT 'COLLATE GERMAN')"
    )
    es.sql("INSERT INTO lit_w (id) VALUES (1)")
    es.sql("INSERT INTO lit_w VALUES (2,'zebra'), (3,'ähre'), (4,'apfel')")
    assert es.sql("SELECT w FROM lit_w WHERE id=1").collect()[0]["w"] == (
        "COLLATE GERMAN"
    )
    got = [
        r["w"]
        for r in es.sql("SELECT w FROM lit_w WHERE id>1 ORDER BY w").collect()
    ]
    assert got == ["apfel", "zebra", "ähre"]  # binary: ä sorts after z
    # unknown pass-through locale: typed rejection at CREATE time
    with pytest.raises(ValueError):
        es.sql("CREATE TABLE bad_at (id int, w varchar(10) COLLATE de_QQ)")
    # COLLATE after another clause (NOT NULL) is still HONORED — the
    # misparse guard strips literals/parens, it must not drop real
    # clauses written later in the definition
    es.sql(
        "CREATE TABLE nn_coll (id int PRIMARY KEY, "
        "w varchar(20) NOT NULL COLLATE GERMAN)"
    )
    es.sql("INSERT INTO nn_coll VALUES (1,'zebra'), (2,'ähre'), (3,'apfel')")
    got = [r["w"] for r in es.sql("SELECT w FROM nn_coll ORDER BY w").collect()]
    assert got == ["ähre", "apfel", "zebra"]


def test_column_collate_ddl_order_and_equality(es):
    """Per-column COLLATE in CREATE TABLE (reference CompareMode.java /
    CompareModeIcu4J.java): ORDER BY and equality follow the named ICU
    collation, not binary codepoints. German: 'ä' carries primary
    weight 'a', so 'ähre' < 'apfel' (h < p at the second letter);
    binary UTF-8 puts U+00E4 after 'z'."""
    es.sql(
        "CREATE TABLE de_sorted (id int PRIMARY KEY, "
        "w varchar(20) COLLATE GERMAN)"
    )
    es.sql("INSERT INTO de_sorted VALUES (1,'zebra'), (2,'ähre'), (3,'apfel')")
    got = [r["w"] for r in es.sql("SELECT w FROM de_sorted ORDER BY w").collect()]
    assert got == ["ähre", "apfel", "zebra"]  # binary would be a, z, ä
    # equality under STRENGTH SECONDARY (case-insensitive)
    es.sql(
        "CREATE TABLE de_ci (id int PRIMARY KEY, "
        "w varchar(20) COLLATE GERMAN STRENGTH SECONDARY)"
    )
    es.sql("INSERT INTO de_ci VALUES (1,'Straße'), (2,'x')")
    ids = {r["id"] for r in es.sql("SELECT id FROM de_ci WHERE w = 'straße'").collect()}
    assert ids == {1}
    # uncollated columns in the same DDL stay binary
    es.sql("CREATE TABLE bin_w (id int PRIMARY KEY, w varchar(20))")
    es.sql("INSERT INTO bin_w VALUES (1,'zebra'), (2,'ähre'), (3,'apfel')")
    got = [r["w"] for r in es.sql("SELECT w FROM bin_w ORDER BY w").collect()]
    assert got == ["apfel", "zebra", "ähre"]
    # unknown locale rejects typed at CREATE time
    with pytest.raises(ValueError):
        es.sql("CREATE TABLE bad_c (id int, w varchar(10) COLLATE QQXYZZY)")


def test_alter_index_schema_user(spark, tmp_path):
    """ALTER INDEX/SCHEMA/USER/DATABASE (Parser.java:4691-4707)."""
    from etl_lealone_spark.session import EngineSession

    s = EngineSession(spark, warehouse=str(tmp_path))
    s.sql("CREATE TABLE t1 (a int PRIMARY KEY, b int)")
    s.sql("CREATE INDEX ix_b ON t1(b)")
    s.sql("ALTER INDEX ix_b RENAME TO ix_bb")
    assert "ix_bb" in s.catalog.indexes and "ix_b" not in s.catalog.indexes

    s.sql("CREATE SCHEMA app")
    s.sql("ALTER SCHEMA app RENAME TO app2")
    assert "app2" in s.catalog.schemas and "app" not in s.catalog.schemas

    s.sql("CREATE USER alice")
    s.sql("ALTER USER alice SET PASSWORD 'pw'")
    s.sql("ALTER USER alice ADMIN TRUE")
    s.sql("ALTER USER alice RENAME TO bob")
    assert "bob" in s.catalog.principals and "alice" not in s.catalog.principals

    s.sql("ALTER DATABASE test RUN MODE sharding")  # accepted + recorded


def test_column_clause_keywords_in_literals_ignored(es):
    """The whole keyword family (NOT NULL / PRIMARY KEY / IDENTITY /
    CHECK), not just COLLATE, must ignore tokens inside DEFAULT string
    literals (2nd-pass review): a column whose DEFAULT literal spells
    'NOT NULL' stays nullable, and the literal value itself survives
    byte-for-byte."""
    es.sql(
        "CREATE TABLE lit_k (id int PRIMARY KEY, "
        "w varchar(40) DEFAULT 'NOT NULL CHECK (x>0)')"
    )
    es.sql("INSERT INTO lit_k (id) VALUES (1)")
    es.sql("INSERT INTO lit_k VALUES (2, NULL)")  # nullable: must pass
    got = {r["id"]: r["w"] for r in es.sql("SELECT id, w FROM lit_k").collect()}
    assert got == {1: "NOT NULL CHECK (x>0)", 2: None}


def test_default_unparenthesized_function_call(es):
    """An unparenthesized expression default must capture the FULL
    nested call: ``DEFAULT COALESCE(...)`` used to truncate at the
    first space (``coalesce(a,``) because the bare-token branch grabbed
    \\S+ (r7 advisor finding); the balanced-group extension now carries
    the whole call through to evaluation."""
    es.sql(
        "CREATE TABLE dflt_fn (id int PRIMARY KEY, "
        "a int, b int DEFAULT COALESCE(NULL, 7), "
        "c varchar(20) DEFAULT CONCAT('x', 'y z'))"
    )
    cons = es.catalog.constraints["dflt_fn"]
    assert cons.defaults["b"] == "COALESCE(NULL, 7)"
    assert cons.defaults["c"] == "CONCAT('x', 'y z')"
    es.sql("INSERT INTO dflt_fn (id, a) VALUES (1, 5)")
    row = es.sql("SELECT b, c FROM dflt_fn WHERE id = 1").collect()[0]
    assert (row["b"], row["c"]) == (7, "xy z")
    # bare non-call tokens keep their old behavior
    es.sql("CREATE TABLE dflt_tok (id int PRIMARY KEY, n int DEFAULT 5)")
    assert es.catalog.constraints["dflt_tok"].defaults["n"] == "5"
