"""Cross-engine deterministic hashing for the fuzzy-dedup family.

The MinHash/SimHash operators need a hash function that (a) is cheap
JVM-side at 100 TB, and (b) can be recomputed bit-for-bit by an
independent engine so the driver's DuckDB oracle can check the FULL
near-dup pipeline, not just its verification kernel. xxhash64 fails (b):
no other engine exposes Spark's seeded variant. This module provides a
family that both Spark and DuckDB evaluate exactly:

- **Base hash** ``md5_hash60``: the top 60 bits of md5 of the string.
  Spark: ``conv(substring(md5(s),1,15),16,10)``; DuckDB:
  ``('0x' || substr(md5(s),1,15))::BIGINT``. Verified identical.
  md5 is ~2x an xxhash64 call, but it is paid once per distinct
  shingle/token — the per-lane work below is pure integer arithmetic.
- **Lane mixing** ``mix60``: 2-universal ``(a*hi + b*lo + c) mod p`` with
  ``p = 2^61 - 1`` (Mersenne) on the 30-bit halves of the base hash.
  Every intermediate fits in a signed 64-bit integer (a,b < 2^31,
  hi,lo < 2^30 → products < 2^61; the 3-term sum < 3·2^61 < 2^63), so
  no decimal/hugeint widening is needed in either engine and Spark keeps
  the whole expression in whole-stage codegen. Deriving 16 MinHash lanes
  this way is CHEAPER than 16 seeded xxhash64 calls — three multiplies
  and two mods per lane.
- **Constants** ``hconsts``: derived from md5 of a tag string, so the
  Spark expression tree and the generated oracle SQL always agree with
  no shared RNG state.

Reference parity note: the reference engine has no fuzzy-dedup surface;
this family backs the BASELINE.json extension operators (dedup.py,
similarity.py). Determinism across engines/runs/partitionings is also
the production property a 100 TB dedup needs: re-running a shard or
migrating engines must not re-draw the hash family.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

P61 = (1 << 61) - 1  # Mersenne prime 2^61-1
MASK30 = (1 << 30) - 1


def hconsts(tag: str, i: int) -> tuple[int, int, int]:
    """Deterministic (a, b, c) mixing constants for lane ``(tag, i)``.

    a, b are odd 31-bit; c < p. Derived from md5 so Python (SQL
    generation) and the Spark expression tree stay in lockstep with no
    seed plumbing.
    """
    d = hashlib.md5(f"etl-xhash:{tag}:{i}".encode()).digest()
    a = (int.from_bytes(d[0:4], "big") >> 1) | 1
    b = (int.from_bytes(d[4:8], "big") >> 1) | 1
    c = int.from_bytes(d[8:16], "big") % P61
    return a, b, c


# ---------------------------------------------------------------------------
# Spark expression side
# ---------------------------------------------------------------------------
def md5_hash60(col: Column) -> Column:
    """Top 60 bits of md5(col) as a non-negative bigint."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def mix60(col: Column, a: int, b: int, c: int) -> Column:
    """(a*hi + b*lo + c) mod 2^61-1 over the 30-bit halves of ``col``.

    Overflow-free signed-64 arithmetic (see module docstring), identical
    in Spark and DuckDB integer semantics for non-negative inputs.
    """
    hi = F.shiftrightunsigned(col, 30)
    lo = col.bitwiseAND(F.lit(MASK30))
    return (
        (F.lit(a).cast("long") * hi) % P61
        + (F.lit(b).cast("long") * lo) % P61
        + F.lit(c)
    ) % P61


# ---------------------------------------------------------------------------
# DuckDB SQL side (same functions as SQL text, for oracle generation)
# ---------------------------------------------------------------------------
def md5_hash60_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def mix60_sql(expr: str, a: int, b: int, c: int) -> str:
    return (
        f"((({a}::BIGINT * ({expr} >> 30)) % {P61} "
        f"+ ({b}::BIGINT * ({expr} & {MASK30})) % {P61} "
        f"+ {c}) % {P61})"
    )


# ---------------------------------------------------------------------------
# Rademacher (±1) plane coefficients for sign-random-projection LSH
# ---------------------------------------------------------------------------
def rademacher_signs(tag: str, num_planes: int, dim: int) -> list[list[int]]:
    """±1 hyperplane coefficients from md5 parity.

    Sign-random-projection LSH needs only the SIGN of a random projection;
    Rademacher (±1) entries give the same cosine-LSH guarantee as Gaussian
    planes (Achlioptas-style sparse projections) while keeping every
    projection an exact INTEGER sum over quantized vectors — so bucket
    ids are bit-identical across engines, partitionings, and reruns, and
    the DuckDB oracle can recompute them.
    """
    return [
        [
            1 if hashlib.md5(f"etl-xhash:{tag}:{p}:{j}".encode()).digest()[0] & 1 else -1
            for j in range(dim)
        ]
        for p in range(num_planes)
    ]
