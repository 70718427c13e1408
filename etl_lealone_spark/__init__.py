"""etl_lealone_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing surface of
the reference system (a Java NewSQL database; see SURVEY.md), re-expressed
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, executed
by Tungsten, designed for 100 TB scale.

Layout
------
- ``session``    : SparkSession factory + the engine "shell" (settings,
                   session variables, sequences, prepared statements).
- ``tables``     : test/warehouse table loading & view registration.
- ``dialect``    : reference-SQL (H2-ish) → Spark SQL rewriter.
- ``operators/`` : join/agg/setop/DML/dedup/similarity/text operators.
- ``sources/``   : CSVREAD/CSVWRITE, SYSTEM_RANGE, VALUES, catalog views.
- ``functions/`` : scalar function catalog (~130 names from the reference).
- ``plans/``     : EXPLAIN helpers / plan assertions used by tests.
- ``streaming/`` : Structured Streaming carriers for incremental pipelines.
- ``workloads/`` : the driver-facing query inventory (Spark builder +
                   DuckDB oracle SQL per operator).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences: `from etl_lealone_spark import
    # EngineSession, build_spark` without importing pyspark at package
    # import time (keeps `import etl_lealone_spark` cheap for tooling)
    if name in ("EngineSession", "build_spark", "default_parallelism"):
        from . import session

        return getattr(session, name)
    if name == "SnapshotTable":
        from .operators.dml import SnapshotTable

        return SnapshotTable
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
