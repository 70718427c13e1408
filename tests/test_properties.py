"""Property-based tests (hypothesis) for the deterministic kernels.

The reference has no property tests (SURVEY §5); these pin the algebraic
invariants the cross-engine determinism story rests on. Hypothesis runs
derandomized so failures are reproducible in CI.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from etl_lealone_spark.operators.xhash import P61, MASK30, hconsts
from etl_lealone_spark.services import parse_methods

settings.register_profile("ci", derandomize=True, max_examples=200)
settings.load_profile("ci")


# -- Z-order interleave is a bijection --------------------------------------
def _interleave_py(coords: list[int], bits: int) -> int:
    z = 0
    n = len(coords)
    for b in range(bits):
        for i, c in enumerate(coords):
            z |= ((c >> b) & 1) << (b * n + i)
    return z


def _deinterleave_py(z: int, n: int, bits: int) -> list[int]:
    out = [0] * n
    for b in range(bits):
        for i in range(n):
            out[i] |= ((z >> (b * n + i)) & 1) << b
    return out


@given(
    st.lists(st.integers(0, (1 << 10) - 1), min_size=2, max_size=4),
)
def test_zorder_interleave_bijective(coords):
    bits = 10
    z = _interleave_py(coords, bits)
    assert _deinterleave_py(z, len(coords), bits) == coords
    assert 0 <= z < 1 << (bits * len(coords))


@given(
    st.lists(st.integers(0, (1 << 8) - 1), min_size=2, max_size=2),
    st.lists(st.integers(0, (1 << 8) - 1), min_size=2, max_size=2),
)
def test_zorder_locality_monotone_on_shared_prefix(a, b):
    """If two points agree on the high bits of both coordinates, their
    z-values land in the same 2^(2*k)-sized block — the locality property
    file pruning relies on."""
    bits = 8
    keep = 4  # shared high bits
    a2 = [(x >> keep) << keep for x in a]
    b2 = [(x >> keep) << keep for x in b]
    if a2 == b2:
        za = _interleave_py(a, bits)
        zb = _interleave_py(b, bits)
        block = 1 << (2 * keep)
        assert za // block == zb // block


# -- mix60 hash-lane algebra -------------------------------------------------
def _mix60_py(h: int, a: int, b: int, c: int) -> int:
    hi, lo = h >> 30, h & MASK30
    return ((a * hi) % P61 + (b * lo) % P61 + c) % P61


@given(st.integers(0, (1 << 60) - 1), st.integers(0, 63))
def test_mix60_range_and_overflow_free(h, lane):
    """Every intermediate fits signed-64 (the codegen guarantee) and the
    result is always inside [0, P61)."""
    a, b, c = hconsts("prop", lane)
    hi, lo = h >> 30, h & MASK30
    assert a * hi < 1 << 63 and b * lo < 1 << 63
    assert (a * hi) % P61 + (b * lo) % P61 + c < 1 << 63
    v = _mix60_py(h, a, b, c)
    assert 0 <= v < P61


@given(st.integers(0, (1 << 60) - 1), st.integers(0, (1 << 60) - 1))
def test_mix60_lanes_decorrelate(h1, h2):
    """Distinct inputs rarely collide in a lane, and when they do they
    don't collide in a second independent lane (2-universality smoke)."""
    if h1 == h2:
        return
    collisions = 0
    for lane in range(4):
        a, b, c = hconsts("prop2", lane)
        if _mix60_py(h1, a, b, c) == _mix60_py(h2, a, b, c):
            collisions += 1
    assert collisions <= 1


# -- dialect rewriter is idempotent ------------------------------------------
@given(
    st.sampled_from(
        [
            "SELECT TOP 3 x FROM SYSTEM_RANGE(1, 10) ORDER BY x",
            "SELECT x FROM SYSTEM_RANGE(1, 5) MINUS SELECT 2",
            "SELECT STRING_AGG(cast(x as varchar(3)), ',') FROM t",
            "SELECT GROUP_CONCAT(a ORDER BY a SEPARATOR ';') FROM t",
            "FROM t SELECT a, b",
            "SELECT ROWNUM, a FROM t",
            "SELECT TODAY, year(SYSDATE) FROM t",
            "SELECT a FROM t WHERE a BETWEEN 1 AND 2 FOR UPDATE",
        ]
    )
)
def test_dialect_rewrite_idempotent(sql):
    from etl_lealone_spark.dialect import rewrite

    once = rewrite(sql)
    assert rewrite(once) == once


# -- service method signature parsing ----------------------------------------
@given(
    st.lists(
        st.tuples(
            st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True),
            st.lists(
                st.tuples(
                    st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True),
                    st.sampled_from(["varchar", "int", "long", "double"]),
                ),
                max_size=3,
            ),
            st.sampled_from(["void", "varchar", "int", "long"]),
        ),
        min_size=1,
        max_size=4,
        unique_by=lambda m: m[0],
    )
)
def test_parse_methods_roundtrip(methods):
    body = ", ".join(
        f"{name}({', '.join(f'{an} {at}' for an, at in args)}) {ret}"
        for name, args, ret in methods
    )
    parsed = parse_methods(body)
    assert set(parsed) == {name for name, _, _ in methods}
    for name, args, ret in methods:
        got_args, got_ret = parsed[name]
        assert got_args == list(args)
        assert got_ret == ret
