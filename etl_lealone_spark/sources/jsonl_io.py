"""JSONL (newline-delimited JSON) source/sink — extension surface.

The reference engine has no JSON table source (its JSON surface is the
scalar function family); JSONL is the de-facto interchange format for
LLM training corpora, so the engine carries a first-class reader/writer
the way it carries CSVREAD/CSVWRITE (sources/csv_io.py).

Scale: spark.read.json is a distributed, splittable scan for
uncompressed files (gzip members are per-file parallel only). Schema
inference requires a FULL extra pass over the data — always pass
``schema`` at scale; ``mode`` controls corrupt-record handling
(PERMISSIVE collects bad lines into ``_corrupt_record`` instead of
failing the 100 TB job at line 97 billion).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def jsonlread(
    spark: SparkSession,
    path: str,
    schema: Optional[str] = None,
    mode: str = "PERMISSIVE",
    columns: Optional[list[str]] = None,
) -> DataFrame:
    """JSONLREAD('path'[, schema]) → DataFrame (one object per line)."""
    reader = spark.read.option("mode", mode)
    if schema:
        reader = reader.schema(schema)
    df = reader.json(path)
    if columns:
        df = df.select(*columns)
    return df


def jsonlwrite(
    df: DataFrame,
    path: str,
    single_file: bool = False,
    compression: Optional[str] = None,
) -> None:
    """JSONLWRITE('path', query): one JSON object per line, one file per
    partition (coalesced to one only for small results)."""
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
