"""Argmin fold-vs-unroll crossover measurement (r11 verdict task 4).

clustering._sq_dist_sql deliberately keeps the ``aggregate(zip_with)``
fold for the k-means argmin: the unrolled per-term sum is ~4.4x faster
per row but pays a ~2.3s Catalyst+janino fixed cost per action,
re-paid every Lloyd iteration — a loss at the 2000-row bench corpus.
The rejection note promises a row-count crossover if anyone extends
the probe; this script measures it.

One assignment pass (k=8 centroids x 64 dims, bigint math identical to
the production kernel), N-replicated sf0.1 embeddings, same expression
built two ways:

- fold:   aggregate(zip_with(vec, array(...), (x,c)->(x-c)*(x-c)), 0L, +)
- unroll: (vec[0]-c0)*(vec[0]-c0) + ... 64 terms, per centroid
  (element_at so NULL/ragged parity matches the fold)

Run: python scripts/argmin_crossover.py 100 1000 10000
(K multipliers of the 2000-row corpus). Warm once, report min of 2.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_lealone_spark.operators.clustering import (  # noqa: E402
    _seed_centroids,
    _sq_dist_sql,
)
from etl_lealone_spark.operators.similarity import quantize  # noqa: E402
from etl_lealone_spark.session import build_spark, default_parallelism  # noqa: E402
from etl_lealone_spark.tables import load_tables  # noqa: E402


def _sq_dist_unrolled(vec_sql: str, centroid: list[int]) -> str:
    return " + ".join(
        f"(element_at({vec_sql}, {i + 1}) - {int(c)}L) * "
        f"(element_at({vec_sql}, {i + 1}) - {int(c)}L)"
        for i, c in enumerate(centroid)
    )


def _argmin_sql(vec_sql: str, cents, dist_fn) -> str:
    arr = "array(" + ", ".join(
        f"struct(({dist_fn(vec_sql, c)}) AS dist, "
        f"CAST({int(cid)} AS BIGINT) AS cid)"
        for cid, c in cents
    ) + ")"
    return f"array_min({arr})"


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [100, 1000]
    spark = build_spark(
        app_name="argmin_crossover", cores=default_parallelism()
    )
    t = load_tables(spark, "/root/testdata/sf0.1")
    e = t["embeddings"].select("vec_id", quantize(F.col("embedding")).alias("qvec"))
    cents = _seed_centroids(e, 8)

    for K in ks:
        rep = e.select(
            "qvec", F.explode(F.sequence(F.lit(1), F.lit(K))).alias("r")
        ).localCheckpoint(eager=True)
        n = rep.count()
        for label, dist_fn in (
            ("fold", _sq_dist_sql),
            ("unroll", _sq_dist_unrolled),
        ):
            expr = F.expr(_argmin_sql("qvec", cents, dist_fn))

            def one():
                return (
                    rep.select(expr.alias("a"))
                    .agg(
                        F.sum("a.dist").alias("sd"),
                        F.sum("a.cid").alias("sc"),
                    )
                    .collect()[0]
                )

            r0 = one()  # warm: pays plan+codegen once
            times = []
            for _ in range(2):
                t0 = time.time()
                r1 = one()
                times.append(time.time() - t0)
            assert (r0.sd, r0.sc) == (r1.sd, r1.sc)
            # cold = fresh logical plan each action (what Lloyd pays):
            # re-alias to defeat any plan reuse
            t0 = time.time()
            rep.select(F.expr(_argmin_sql("qvec", cents, dist_fn)).alias(f"a{K}{label}")) \
                .agg(F.sum(f"a{K}{label}.dist")).collect()
            cold = time.time() - t0
            print(
                f"K={K} rows={n} {label}: warm_min={min(times):.2f}s "
                f"cold={cold:.2f}s checksum=({r0.sd},{r0.sc})",
                flush=True,
            )


if __name__ == "__main__":
    main()
