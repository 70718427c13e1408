"""CSVREAD / CSVWRITE (reference: Function.java:352-353, impl
lealone-db/src/main/java/org/lealone/db/Csv.java:46,123-191).

The reference reads a CSV file into a result set usable in FROM and
writes query results to CSV. Spark equivalents are the csv reader/writer;
options mirror the reference's option string (fieldSeparator, charset,
null text, writeColumnHeader).

Scale: spark.read.csv is a distributed scan (splittable for uncompressed
files); schema inference is off by default at scale — pass a schema or
accept all-string columns exactly like the reference does (Csv.java reads
everything as VARCHAR).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def csvread(
    spark: SparkSession,
    path: str,
    columns: Optional[list[str]] = None,
    field_separator: str = ",",
    charset: str = "UTF-8",
    null_string: Optional[str] = None,
    header: bool = True,
    schema: Optional[str] = None,
) -> DataFrame:
    """CSVREAD('path'[, 'colList'[, options]]) → DataFrame.

    Reference semantics: all columns VARCHAR unless the caller casts
    (Csv.java:46); passing ``columns`` overrides/supplies the header.
    """
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", field_separator)
        .option("encoding", charset)
    )
    if null_string is not None:
        reader = reader.option("nullValue", null_string)
    if schema:
        reader = reader.schema(schema)
    df = reader.csv(path)
    if columns:
        df = df.toDF(*columns)
    return df


def file_read(spark: SparkSession, path: str) -> DataFrame:
    """FILE_READ('path') (Function.java:365): file contents as a blob.

    Spark's binaryFile source returns (path, modificationTime, length,
    content) — content is the BLOB column; distributed over files.
    """
    return spark.read.format("binaryFile").load(path)


def csvwrite(
    df: DataFrame,
    path: str,
    field_separator: str = ",",
    charset: str = "UTF-8",
    null_string: str = "",
    header: bool = True,
    single_file: bool = False,
) -> None:
    """CSVWRITE('path', query) → file(s).

    ``single_file=True`` coalesces to one partition to mirror the
    reference's single-file output — only sane for small results; at
    scale leave it False and get one file per partition.
    """
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("sep", field_separator)
        .option("encoding", charset)
        .option("nullValue", null_string)
        .csv(path)
    )
