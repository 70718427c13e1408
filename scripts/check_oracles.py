"""Local replica of the driver's t2 correctness gate.

Runs every workload's Spark build AND its DuckDB oracle at a given scale
factor, compares row count + sorted-column value frame, prints PASS/FAIL
per query. Use while iterating:

    python scripts/check_oracles.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from etl_lealone_spark.session import build_spark  # noqa: E402
from etl_lealone_spark.tables import TABLE_NAMES  # noqa: E402
from etl_lealone_spark.workloads import all_workloads  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


class NonScalarCell(ValueError):
    """A result cell holds a list/array/dict — the driver comparator
    crashes on these (round-3 postmortem: embedding_quantize_int8), so
    the local gate must reject them too. md5/array_join such columns in
    BOTH engines instead (see operators/xhash.py conventions)."""


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell values, sort rows.

    Bit-compatible with the driver's comparator (round-3 postmortem):
    - floats are NEVER int-ified — a DuckDB HUGEINT surfacing as
      float64 ``0.0`` must mismatch Spark's int ``0`` here exactly as
      it does in the driver's hash (fix the oracle with an explicit
      ``CAST(... AS BIGINT)``, not the comparator);
    - list/array/dict cells raise ``NonScalarCell`` — the driver's
      hasher dies on them (``unhashable type: 'list'``).
    """
    df = df[sorted(df.columns)].copy()

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            return repr(float(v))
        if isinstance(v, (list, tuple, dict)) or type(v).__name__ == "ndarray":
            raise NonScalarCell(
                f"non-scalar result cell {type(v).__name__}: md5/array_join "
                "it in both engines (xhash rule)"
            )
        return str(v)

    for c in df.columns:
        df[c] = df[c].map(norm)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]
    spark = build_spark(cores=8, shuffle_partitions=8)
    con = duck_con(sf_dir)
    wl = all_workloads()
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name, w in sorted(wl.items()):
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            sdf = w.build(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark build crashed")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue
        if w.oracle is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(w.oracle).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL crashed: {e}")
            n_fail += 1
            failures.append(name)
            continue
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1
            failures.append(name)
            continue
        if sorted(map(str.lower, sdf.columns)) != sorted(map(str.lower, odf.columns)):
            print(
                f"FAIL  {name}: columns spark={sorted(sdf.columns)} "
                f"oracle={sorted(odf.columns)}"
            )
            n_fail += 1
            failures.append(name)
            continue
        odf.columns = [c.lower() for c in odf.columns]
        sdf.columns = [c.lower() for c in sdf.columns]
        try:
            cs, co = canonical(sdf), canonical(odf)
        except NonScalarCell as e:
            print(f"FAIL  {name}: {e}")
            n_fail += 1
            failures.append(name)
            continue
        if cs.equals(co):
            print(f"PASS  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            diff_mask = (cs != co).any(axis=1)
            print(f"FAIL  {name}: value mismatch on {int(diff_mask.sum())}/{len(cs)} rows")
            bad = diff_mask[diff_mask].index[:3]
            for i in bad:
                print(f"      spark : {cs.loc[i].to_dict()}")
                print(f"      oracle: {co.loc[i].to_dict()}")
            n_fail += 1
            failures.append(name)
    print(
        f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
        f"(of {len(wl)} workloads)"
    )
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
