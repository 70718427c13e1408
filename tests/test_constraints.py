"""Write-time constraint enforcement: NOT NULL, CHECK, DEFAULT, computed
columns, unique indexes (reference Column.java:70-81,
GlobalUniqueIndex.java:33)."""

from __future__ import annotations

import pytest

from etl_lealone_spark.session import EngineSession


@pytest.fixture()
def es(spark, tmp_path):
    return EngineSession(spark, warehouse=str(tmp_path))


def test_not_null_enforced(es):
    es.sql("CREATE TABLE nn (id int NOT NULL, v int)")
    es.sql("INSERT INTO nn VALUES (1, 10)")
    with pytest.raises(ValueError, match="constraint violation"):
        es.sql("INSERT INTO nn (v) VALUES (5)")
    assert es.sql("SELECT count(*) FROM nn").collect()[0][0] == 1


def test_check_constraint(es):
    es.sql("CREATE TABLE ck (id int, pct int CHECK (pct BETWEEN 0 AND 100))")
    es.sql("INSERT INTO ck VALUES (1, 50)")
    with pytest.raises(ValueError, match="constraint violation"):
        es.sql("INSERT INTO ck VALUES (2, 150)")
    with pytest.raises(ValueError, match="constraint violation"):
        es.sql("UPDATE ck SET pct = -5 WHERE id = 1")
    assert es.sql("SELECT pct FROM ck").collect()[0][0] == 50


def test_table_level_check(es):
    es.sql("CREATE TABLE tc (a int, b int, CHECK (a < b))")
    es.sql("INSERT INTO tc VALUES (1, 2)")
    with pytest.raises(ValueError, match="constraint violation"):
        es.sql("INSERT INTO tc VALUES (5, 2)")


def test_default_applied(es):
    es.sql("CREATE TABLE d (id int, status varchar(10) DEFAULT 'new', n int DEFAULT 0)")
    es.sql("INSERT INTO d (id) VALUES (1)")
    row = es.sql("SELECT * FROM d").collect()[0]
    assert row["status"] == "new" and row["n"] == 0
    es.sql("INSERT INTO d (id, status) VALUES (2, 'old')")
    assert es.sql("SELECT status FROM d WHERE id = 2").collect()[0][0] == "old"


def test_computed_column(es):
    es.sql("CREATE TABLE cc (a int, b int, total int AS (a + b))")
    es.sql("INSERT INTO cc (a, b) VALUES (2, 3)")
    assert es.sql("SELECT total FROM cc").collect()[0][0] == 5
    # computed even if the insert tries to supply it
    es.sql("INSERT INTO cc VALUES (10, 20, 999)")
    assert es.sql("SELECT total FROM cc WHERE a = 10").collect()[0][0] == 30


def test_pk_unique_enforced(es):
    es.sql("CREATE TABLE pku (id int PRIMARY KEY, v varchar(5))")
    es.sql("INSERT INTO pku VALUES (1, 'a'), (2, 'b')")
    with pytest.raises(ValueError, match="unique constraint"):
        es.sql("INSERT INTO pku VALUES (1, 'dup')")
    assert es.sql("SELECT count(*) FROM pku").collect()[0][0] == 2


def test_unique_index_enforced(es):
    es.sql("CREATE TABLE uq (id int, email varchar(30))")
    es.sql("CREATE UNIQUE INDEX uq_email ON uq(email)")
    es.sql("INSERT INTO uq VALUES (1, 'a@x.com')")
    with pytest.raises(ValueError, match="unique constraint"):
        es.sql("INSERT INTO uq VALUES (2, 'a@x.com')")


def test_unique_index_allows_multiple_nulls(es):
    # H2/Lealone unique indexes: NULL != NULL, any number of NULLs allowed
    es.sql("CREATE TABLE uqn (id int, email varchar(30))")
    es.sql("CREATE UNIQUE INDEX uqn_email ON uqn(email)")
    es.sql("INSERT INTO uqn VALUES (1, NULL)")
    es.sql("INSERT INTO uqn VALUES (2, NULL)")
    assert es.sql("SELECT count(*) FROM uqn").collect()[0][0] == 2
    with pytest.raises(ValueError, match="unique constraint"):
        es.sql("INSERT INTO uqn VALUES (3, 'x@x.com'), (4, 'x@x.com')")


def test_merge_respects_unique_pk(es):
    es.sql("CREATE TABLE mu (id int PRIMARY KEY, v int)")
    es.sql("INSERT INTO mu VALUES (1, 10), (2, 20)")
    # MERGE by the PK cannot create duplicates — upsert succeeds
    es.sql("MERGE INTO mu KEY(id) VALUES (1, 11), (3, 30)")
    assert es.sql("SELECT count(*) FROM mu").collect()[0][0] == 3
