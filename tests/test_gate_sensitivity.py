"""Sensitivity of the correctness gate's comparator (scripts/
check_oracles.canonical): the whole verification story rests on this
comparison actually DETECTING divergence. These tests corrupt known-
equal frames one way at a time and assert the gate flags each — a
comparator that silently normalizes differences away would make every
green sweep meaningless."""

from __future__ import annotations

import sys

import pandas as pd

sys.path.insert(0, ".")

from scripts.check_oracles import canonical  # noqa: E402


def _eq(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    return canonical(a.copy()).equals(canonical(b.copy()))


BASE = pd.DataFrame(
    {
        "k": [3, 1, 2],
        "v": [30.0, 10.5, None],
        "s": ["c", "a", "b"],
        "arr": [[1, 2], [3], []],
    }
)


def test_comparator_accepts_row_order_and_float_int_forms():
    shuffled = BASE.iloc[[2, 0, 1]].reset_index(drop=True)
    assert _eq(BASE, shuffled)
    # 30.0 vs integer 30: engines disagree on int/float return types
    alt = BASE.copy()
    alt["v"] = [30, 10.5, None]
    assert _eq(BASE, alt)
    # None vs NaN are the same null
    alt2 = BASE.copy()
    alt2["v"] = [30.0, 10.5, float("nan")]
    assert _eq(BASE, alt2)


def test_comparator_detects_value_change():
    bad = BASE.copy()
    bad.loc[1, "v"] = 10.500001
    assert not _eq(BASE, bad)


def test_comparator_detects_null_flip():
    bad = BASE.copy()
    bad.loc[2, "v"] = 0.0  # NULL -> 0 is a classic silent bug
    assert not _eq(BASE, bad)


def test_comparator_detects_string_case_and_whitespace():
    bad = BASE.copy()
    bad.loc[0, "s"] = "C"
    assert not _eq(BASE, bad)
    bad2 = BASE.copy()
    bad2.loc[0, "s"] = "c "
    assert not _eq(BASE, bad2)


def test_comparator_detects_array_content_and_order():
    bad = BASE.copy()
    bad.at[0, "arr"] = [2, 1]  # array ORDER is semantic (not row order)
    assert not _eq(BASE, bad)
    bad2 = BASE.copy()
    bad2.at[2, "arr"] = [0]
    assert not _eq(BASE, bad2)


def test_comparator_detects_duplicated_vs_distinct_rows():
    dup = pd.DataFrame({"k": [1, 1], "v": [5.0, 5.0]})
    single_plus = pd.DataFrame({"k": [1, 2], "v": [5.0, 5.0]})
    assert not _eq(dup, single_plus)


def test_comparator_detects_float_last_ulp():
    a = pd.DataFrame({"x": [0.1 + 0.2]})
    b = pd.DataFrame({"x": [0.3]})
    # 0.1+0.2 != 0.3 in IEEE doubles; repr-based normalization must NOT
    # round them together (the determinism rules exist precisely so
    # workloads never rely on such near-equality)
    assert not _eq(a, b)
