"""Experiment: W4 join strategies + W2/W3 scan configs at 5e7 rows.

Variants measured (idle machine, min of 3):
- w4 shuffled-hash (current bench config)
- w4 broadcast (default planner)
- w4 bucketed tables (PK-clustered storage — the reference's BTree
  primary-key layout translated to Spark bucketing): zero-exchange join
- w2/w3 at maxPartitionBytes 16/64/128 MB
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from etl_lealone_spark.session import build_spark

N = 50_000_000
tmp = "/tmp/w4_exp"
spark = build_spark(
    app_name="w4_experiment",
    cores=32,
    extra_conf={"spark.sql.warehouse.dir": f"{tmp}/warehouse"},
)

df = spark.range(N).select(
    F.col("id").cast("int").alias("f1"), (F.col("id") * 10).alias("f2")
)
small = spark.range(N // 10).select(
    F.col("id").cast("int").alias("id2"), F.lit("x").alias("name2")
)
df.write.mode("overwrite").parquet(f"{tmp}/test")
small.write.mode("overwrite").parquet(f"{tmp}/small")


def timeit(label, fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(f"{label}: {min(ts):.3f}s  (all: {[round(t,2) for t in ts]})", flush=True)


def joins(t, s):
    t.join(s, t.f1 == s.id2, "inner").agg(F.count(F.lit(1))).collect()
    t.join(s, t.f1 == s.id2, "left").agg(F.count(F.lit(1))).collect()


# --- w4 variant A: current bench config (SHJ) ---
spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 << 20))
spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(4 << 20))
t = spark.read.parquet(f"{tmp}/test")
s = spark.read.parquet(f"{tmp}/small")
timeit("w4[SHJ,16m]", lambda: joins(t, s))

# --- w4 variant B: broadcast ---
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(512 << 20))
timeit("w4[broadcast]", lambda: joins(t, s))
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(4 << 20))

# --- w4 variant C: bucketed (PK-clustered) tables ---
t0 = time.time()
df.write.mode("overwrite").bucketBy(32, "f1").sortBy("f1").format(
    "parquet"
).saveAsTable("test_b")
print(f"bucketed write big: {time.time()-t0:.3f}s", flush=True)
t0 = time.time()
small.write.mode("overwrite").bucketBy(32, "id2").sortBy("id2").format(
    "parquet"
).saveAsTable("small_b")
print(f"bucketed write small: {time.time()-t0:.3f}s", flush=True)
tb = spark.table("test_b")
sb = spark.table("small_b")
timeit("w4[bucketed,SHJ-pref]", lambda: joins(tb, sb))
spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
timeit("w4[bucketed,SMJ-pref]", lambda: joins(tb, sb))
spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
tb.join(sb, tb.f1 == sb.id2, "inner").agg(F.count(F.lit(1))).explain()

# --- w2/w3 scan configs ---
def w2(t):
    t.filter(F.col("f2") % 1000 == 0).agg(F.count(F.lit(1))).collect()


def w3(t):
    (
        t.groupBy((F.col("f1") % 97).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"), F.avg("f2").alias("a"))
        .filter(F.col("n") > 10)
        .write.format("noop").mode("overwrite").save()
    )


for label, mpb in [("16m", 16 << 20), ("32m", 32 << 20), ("64m", 64 << 20), ("128m", 128 << 20)]:
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb))
    t = spark.read.parquet(f"{tmp}/test")
    timeit(f"w2[{label}]", lambda: w2(t))
    timeit(f"w3[{label}]", lambda: w3(t))

# duckdb reference on the identical files
import duckdb

con = duckdb.connect()
gt, gs = f"{tmp}/test/*.parquet", f"{tmp}/small/*.parquet"
for label, stmts in [
    ("w2_duck", [f"SELECT count(*) FROM '{gt}' WHERE f2 % 1000 = 0"]),
    ("w3_duck", [f"SELECT f1 % 97 g, count(*) n, avg(f2) a FROM '{gt}' GROUP BY g HAVING count(*) > 10"]),
    ("w4_duck", [
        f"SELECT count(*) FROM '{gt}' t JOIN '{gs}' s ON t.f1 = s.id2",
        f"SELECT count(*) FROM '{gt}' t LEFT JOIN '{gs}' s ON t.f1 = s.id2",
    ]),
]:
    def run(stmts=stmts):
        for st in stmts:
            con.execute(st).fetchall()
    timeit(label, run)
