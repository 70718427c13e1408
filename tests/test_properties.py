"""Property-based tests (hypothesis) for the DML/dedup algebra.

The reference's tests are example-based; these pin the LAWS the snapshot
DML and dedup operators must satisfy for arbitrary inputs — the kind of
invariants that survive a 100TB scale-up or not at all."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_lealone_spark.operators.dedup import word_shingles
from etl_lealone_spark.operators.dml import (
    apply_delete,
    apply_update,
    merge_by_key,
)

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),  # pk-ish (dups allowed)
        st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
    ),
    min_size=0,
    max_size=25,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _df(spark, rows):
    return spark.createDataFrame(rows or [(None, None)], "k int, v int").filter(
        F.lit(bool(rows))
    )


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_update_preserves_rowcount(spark, rows):
    df = _df(spark, rows)
    out = apply_update(df, F.col("v") > 0, {"v": F.col("v") * 2})
    assert out.count() == df.count()


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_delete_partitions_rows(spark, rows):
    """delete(cond) + the deleted complement = original row count, with
    NULL condition rows always on the kept side (3VL)."""
    df = _df(spark, rows)
    cond = F.col("v") > 0
    kept = apply_delete(df, cond)
    deleted = df.filter(cond.isNotNull() & cond)
    assert kept.count() + deleted.count() == df.count()
    assert kept.filter(F.col("v").isNull()).count() == df.filter(
        F.col("v").isNull()
    ).count()


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_merge_idempotent(spark, rows):
    """Merging the same source twice equals merging once (upsert law)."""
    uniq = {}
    for k, v in rows:
        uniq[k] = v
    target = spark.createDataFrame(
        [(k, v) for k, v in uniq.items()] or [(0, 0)], "k int, v int"
    )
    source = spark.createDataFrame([(1, 999), (99, 1)], "k int, v int")
    once = merge_by_key(target, source, ["k"])
    twice = merge_by_key(once, source, ["k"])
    got_once = sorted(map(tuple, once.collect()))
    got_twice = sorted(map(tuple, twice.collect()))
    assert got_once == got_twice


TEXTS = st.lists(
    st.text(
        alphabet=st.sampled_from("abc xyz 123 .,!"),
        min_size=0,
        max_size=60,
    ),
    min_size=1,
    max_size=8,
)


@given(texts=TEXTS)
@settings(**_SETTINGS)
def test_shingles_match_python_reference(spark, texts):
    """word_shingles (JVM expression) ≡ a plain-Python reference impl."""
    import re as _re

    def py_shingles(t: str) -> list[str]:
        norm = _re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()
        ws = norm.split(" ")
        if len(ws) < 3:
            return [norm]
        seen, out = set(), []
        for i in range(len(ws) - 2):
            s = " ".join(ws[i : i + 3])
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r["s"] for r in df.select(word_shingles(F.col("t")).alias("s")).collect()]
    assert got == [py_shingles(t) for t in texts]


EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=20,
)


@given(edges=EDGES)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_connected_components_match_union_find(spark, edges):
    """CC labels equal a driver-side union-find's min-of-component,
    for arbitrary small graphs (edge order / duplicates / chains)."""
    from etl_lealone_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    want = {n: min(members) for members in comp.values() for n in members}
    assert got == want
