"""bench.py emit() tail-budget pins (r11 verdict task 7 + advisor).

The round-record keeps only the LAST ~2000 chars of bench stdout and
parses the final line as JSON; six straight rounds parsed with the line
at 1791-1799 of the 1800-char budget, so one more always-included key
would have tipped the NEXT round into the trim path silently. These
tests pin, at commit time rather than parse time:

1. the final compact line NEVER exceeds _TAIL_BUDGET, even with
   worst-case-width timing values and the post-trim queries_omitted
   substitution (the r11 advisor found the old code substituted the
   real count AFTER trimming, so the printed line could exceed the
   trim bound by the digit difference);
2. the unconditional skeleton (baseline + ext dual-run pairs + every
   anchor, headline queries all trimmed away) fits with >= 50 chars of
   headroom, so adding one more always-included key fails HERE first.

No SparkSession: emit() is pure formatting over precomputed timings.
"""

import io
import json
from contextlib import redirect_stdout

import pytest

import bench

# worst realistic width for a timing value: 4 integer digits + 3
# decimals ("9999.999") — a >2.7-hour single query would already have
# failed the round on wall-clock long before formatting matters
_WIDE = 9999.999


def _worst_case_parts():
    timings = {name: _WIDE for name in bench.HEADLINE}
    baseline = {}
    for k, dk in [
        ("w1_bulk_insert", "w1_duckdb"),
        ("w2_scan_predicate", "w2_duckdb"),
        ("w2_decode_substrate", "w2sub_duckdb"),
        ("w3_groupby_having", "w3_duckdb"),
        ("w4_joins", "w4_duckdb"),
        ("w5_topk_offset", "w5_duckdb"),
    ]:
        baseline[k] = _WIDE
        baseline[dk] = _WIDE
    baseline["w5_plain_sort"] = _WIDE
    ext = {}
    for name in bench.EXT_DUAL:
        ext[f"ext_{name}_spark"] = _WIDE
        ext[f"ext_{name}_duckdb"] = _WIDE
    anchors = {"anchor_first": _WIDE, "anchor_last": _WIDE,
               "anchor_pre_ml": _WIDE, "anchor_post_ml": _WIDE}
    for key in bench._SEGMENT_ANCHORS.values():
        anchors[key] = _WIDE
    payload = {
        "metric": "headline_suite_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {**timings, **baseline, **ext, **anchors},
        "sf": 0.1,
        "baseline_rows": 50_000_000,
    }
    return payload, timings, baseline, ext


def _emit_lines(tmp_path):
    payload, timings, baseline, ext = _worst_case_parts()
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.emit(payload, timings, baseline, ext, out_dir=str(tmp_path))
    lines = buf.getvalue().rstrip("\n").split("\n")
    assert len(lines) == 2, "emit prints detail line + compact line"
    return payload, lines


def test_final_line_within_tail_budget(tmp_path):
    payload, lines = _emit_lines(tmp_path)
    final = lines[-1]
    assert len(final) <= bench._TAIL_BUDGET, (
        f"compact line {len(final)} chars exceeds _TAIL_BUDGET="
        f"{bench._TAIL_BUDGET}; the driver tail keeps ~2000 chars and a "
        f"front-truncated final line records parsed=null for the round"
    )
    parsed = json.loads(final)
    # accounting invariant: omitted + kept == total measured
    assert parsed["queries_omitted"] + len(parsed["queries"]) == len(
        payload["queries"]
    )
    # the graded ratio pairs survive trimming in the worst case
    for k in ("w1_bulk_insert", "w1_duckdb", "anchor_first", "anchor_last"):
        assert k in parsed["queries"], f"always-include key {k} trimmed"


def test_skeleton_headroom_50_chars(tmp_path):
    """The unconditional key set must fit with >= 50 chars spare, so the
    NEXT always-included key is caught by this test, not by a null parse
    in the round record."""
    payload, timings, baseline, ext = _worst_case_parts()
    skeleton = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": payload["unit"],
        "sf": payload["sf"],
        "baseline_rows": payload["baseline_rows"],
        "detail": "BENCH_DETAIL.json",
        "queries_omitted": len(payload["queries"]),
        "queries": {
            **baseline,
            **ext,
            **{k: v for k, v in payload["queries"].items()
               if k.startswith("anchor_")},
        },
    }
    line = json.dumps(skeleton, separators=(",", ":"))
    assert len(line) <= bench._TAIL_BUDGET - 50, (
        f"unconditional skeleton is {len(line)} chars; needs >= 50 chars "
        f"of headroom under _TAIL_BUDGET={bench._TAIL_BUDGET} before "
        f"another always-included key is safe"
    )


def test_detail_file_carries_every_query(tmp_path):
    payload, lines = _emit_lines(tmp_path)
    with open(tmp_path / "BENCH_DETAIL.json") as f:
        detail = json.load(f)
    assert detail["queries"] == payload["queries"]
    # penultimate stdout line is the full payload (front-truncation safe)
    assert json.loads(lines[0])["queries"] == payload["queries"]


def test_emit_survives_pathological_budget(tmp_path, monkeypatch):
    """Even a skeleton larger than the budget degrades to an empty
    queries map and still prints valid JSON (a dead process records
    nothing — r10 advisor)."""
    monkeypatch.setattr(bench, "_TAIL_BUDGET", 200)
    payload, lines = _emit_lines(tmp_path)
    final = json.loads(lines[-1])
    assert final["queries"] == {}
    assert final["queries_omitted"] == len(payload["queries"])
