"""Z-order layout workload: the Morton-key arithmetic checked
cross-engine (operators/layout.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.layout import interleave_bits_sql, zorder_key
from ..tables import load_tables
from . import workload

_BITS = 10
_CELLS = float((1 << _BITS) - 1)
_TOP = (1 << _BITS) - 1


def _o_grid(expr: str, mn: str, mx: str) -> str:
    """Oracle grid coordinate with SQL-computed bounds — textually the
    same arithmetic as layout.grid_coord evaluates with literal bounds:
    identical operand values + identical op order = identical doubles."""
    scaled = (
        f"CAST(floor((CAST({expr} AS DOUBLE) - {mn}) * {_CELLS!r} / ({mx} - {mn}))"
        f" AS BIGINT)"
    )
    return f"greatest(CAST(0 AS BIGINT), least(CAST({_TOP} AS BIGINT), {scaled}))"


@workload(
    "zorder_curve_keys",
    f"""
    WITH b AS (
      SELECT min(CAST(user_id AS DOUBLE)) AS mnu, max(CAST(user_id AS DOUBLE)) AS mxu,
             min(CAST(value   AS DOUBLE)) AS mnv, max(CAST(value   AS DOUBLE)) AS mxv
      FROM events
    ),
    z AS (
      SELECT event_id,
             {interleave_bits_sql(
                 [_o_grid('user_id', 'b.mnu', 'b.mxu'),
                  _o_grid('value', 'b.mnv', 'b.mxv')],
                 _BITS)} AS zkey
      FROM events, b
    )
    SELECT event_id, zkey FROM z
    ORDER BY zkey, event_id
    LIMIT 100
    """,
    doc="Morton (Z-order) clustering key over (user_id, value): grid "
    "quantization + bit interleave, recomputed bit-for-bit by the "
    "oracle. The layout rewrite itself is OPTIMIZE … ZORDER BY "
    "(catalog router) — skipping effectiveness pinned in test_layout.",
)
def zorder_curve_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    z = zorder_key(ev, ["user_id", "value"], bits=_BITS)
    return (
        ev.select("event_id", z.alias("zkey"))
        .orderBy("zkey", "event_id")
        .limit(100)
    )
