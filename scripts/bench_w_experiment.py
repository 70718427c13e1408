"""One-off experiment: W2/W3/W4 at 5e7 rows under different scan/join
configs, to size the levers before changing bench.py. Not part of the
driver surface."""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from etl_lealone_spark.session import build_spark

N = 50_000_000
spark = build_spark(app_name="w_experiment", cores=32)
tmp = "/tmp/w_exp"

df = spark.range(N).select(
    F.col("id").cast("int").alias("f1"), (F.col("id") * 10).alias("f2")
)
df.write.mode("overwrite").parquet(f"{tmp}/test")
small = spark.range(N // 10).select(
    F.col("id").cast("int").alias("id2"), F.lit("x").alias("name2")
)
small.write.mode("overwrite").parquet(f"{tmp}/small")

test = spark.read.parquet(f"{tmp}/test")
print("files→partitions (default):", test.rdd.getNumPartitions())


def timeit(label, fn):
    fn()  # warm
    t0 = time.time()
    fn()
    print(f"{label}: {time.time() - t0:.3f}s")


def w2():
    test.filter(F.col("f2") % 1000 == 0).agg(F.count(F.lit(1))).collect()


def w3():
    (
        test.groupBy((F.col("f1") % 97).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"), F.avg("f2").alias("a"))
        .filter(F.col("n") > 10)
        .write.format("noop").mode("overwrite").save()
    )


sm = spark.read.parquet(f"{tmp}/small")


def w4():
    test.join(sm, test.f1 == sm.id2, "inner").agg(F.count(F.lit(1))).collect()
    test.join(sm, test.f1 == sm.id2, "left").agg(F.count(F.lit(1))).collect()


for label, mpb in [("128m(default)", None), ("32m", 32 << 20), ("16m", 16 << 20), ("8m", 8 << 20)]:
    if mpb is not None:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb))
    test = spark.read.parquet(f"{tmp}/test")
    print(f"-- maxPartitionBytes={label}, scan partitions:", test.rdd.getNumPartitions())
    timeit(f"w2[{label}]", w2)
    timeit(f"w3[{label}]", w3)

spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 << 20))
test = spark.read.parquet(f"{tmp}/test")
sm = spark.read.parquet(f"{tmp}/small")
timeit("w4[bcast,16m]", w4)


def w4_shj():
    test.join(sm.hint("SHUFFLE_HASH"), test.f1 == sm.id2, "inner").agg(
        F.count(F.lit(1))
    ).collect()
    test.join(sm.hint("SHUFFLE_HASH"), test.f1 == sm.id2, "left").agg(
        F.count(F.lit(1))
    ).collect()


timeit("w4[shuffle_hash,16m]", w4_shj)

import duckdb

con = duckdb.connect()
gt, gs = f"{tmp}/test/*.parquet", f"{tmp}/small/*.parquet"
for label, sql in [
    ("w2_duck", f"SELECT count(*) FROM '{gt}' WHERE f2 % 1000 = 0"),
    ("w3_duck", f"SELECT f1 % 97 g, count(*) n, avg(f2) a FROM '{gt}' GROUP BY g HAVING count(*) > 10"),
    ("w4_duck", f"SELECT count(*) FROM '{gt}' t JOIN '{gs}' s ON t.f1 = s.id2; SELECT count(*) FROM '{gt}' t LEFT JOIN '{gs}' s ON t.f1 = s.id2"),
]:
    for stmt in sql.split(";"):
        con.execute(stmt).fetchall()
    t0 = time.time()
    for stmt in sql.split(";"):
        con.execute(stmt).fetchall()
    print(f"{label}: {time.time() - t0:.3f}s")
