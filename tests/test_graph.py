"""Fixed-point PageRank: bit-identical to a pure-Python reference, and
invariant under repartitioning."""

from __future__ import annotations

from collections import Counter, defaultdict

from etl_lealone_spark.operators.graph import SCALE, pagerank


def _py_pagerank(edges, iters, damping=0.85):
    d_num = int(round(damping * 1000))
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {t for _, t in e})
    n = len(nodes)
    out = Counter(s for s, _ in e)
    r = {v: SCALE for v in nodes}
    total = n * SCALE
    for _ in range(iters):
        share = {
            v: ((r[v] * d_num) // 1000) // out[v] if out.get(v) else 0
            for v in nodes
        }
        inflow = defaultdict(int)
        for s, t in e:
            inflow[t] += share[s]
        sent = sum(share[v] * out.get(v, 0) for v in nodes)
        base = (total - sent) // n
        r = {v: inflow.get(v, 0) + base for v in nodes}
    return r


EDGES = (
    [(i, 0) for i in range(1, 8)]          # star into hub 0
    + [(0, 1), (1, 2), (2, 3), (3, 1)]     # cycle + hub outflow
    + [(9, 0), (9, 2)]                      # 9 has out-edges; 8 dangling target
    + [(4, 8)]                              # 8 is a sink (dangling)
)


def test_pagerank_matches_python_reference(spark):
    d = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: r["rank_x1e9"] for r in pagerank(d, iters=6).collect()}
    want = _py_pagerank(EDGES, iters=6)
    assert got == want
    # mass is conserved up to the n-division floor dust per round
    assert abs(sum(got.values()) - len(want) * SCALE) < len(want) * 6


def test_pagerank_ordering_follows_structure(spark):
    d = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: r["rank_x1e9"] for r in pagerank(d, iters=8).collect()}
    # the hub's whole mass feeds the 1->2->3->1 cycle, so cycle members
    # outrank everything; the hub still outranks every star leaf
    assert max(got, key=got.get) in (1, 2, 3)
    assert got[0] > got[5]  # hub > leaf


def test_pagerank_partitioning_invariant(spark):
    d = spark.createDataFrame(EDGES * 3, "src long, dst long")  # dup edges dedup
    a = sorted(pagerank(d.coalesce(1), iters=5).collect())
    b = sorted(pagerank(d.repartition(7), iters=5).collect())
    assert a == b


def test_pagerank_empty_and_self_loop_edges(spark):
    import pyspark.sql.functions as F

    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty, iters=2).count() == 0

    # self-loops are legal edges: a node may cite itself
    d = spark.createDataFrame([(1, 1), (1, 2)], "src long, dst long")
    got = {r["node"]: r["rank_x1e9"] for r in pagerank(d, iters=2).collect()}
    assert set(got) == {1, 2} and all(v > 0 for v in got.values())
