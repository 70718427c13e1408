#!/usr/bin/env python
"""Per-workload driver-evidence ledger + staleness-driven window policy.

The driver's correctness gate checks only the FIRST 50 entries of
``queries()`` each round, so registration order (workloads/__init__.py
``_PRIORITY``) decides which workloads get fresh driver evidence. This
script makes that policy auditable and mechanical:

1. **ledger**: read every ``CORRECTNESS_r0*.json`` at the repo root and
   print, per workload, the most recent round with a fully-green row
   (rows+schema+hash match, no err) and the resulting evidence age.
2. **window**: propose the next round's 50-slot window,
   oldest-evidence-first — never-checked workloads lead, then ascending
   last-green round (ties broken by name for determinism).

Round-5 policy (r4 verdict task 2): the window can hold 50 of the 118
workloads whose last green row predates r04, so one round cannot reach
age<=1 for all 168 — the ledger states exactly who is covered when, and
each subsequent round drains the oldest stratum first. Workloads whose
implementing module changed since their last driver row are flagged
(evidence for OLD code) so they can be promoted manually.

Usage:
  python scripts/evidence_ledger.py            # ledger table
  python scripts/evidence_ledger.py window     # proposed next window
  python scripts/evidence_ledger.py check      # verify _PRIORITY window
                                               # matches the policy
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def load_ledger(as_of: int | None = None) -> tuple[dict[str, int], int]:
    """{workload: last_green_round (0 = never green)}, latest_round.

    ``as_of`` restricts the ledger to rounds <= as_of — used by ``check``
    to validate a window against the evidence that existed when the
    window was authored (r5 advisor: a freshly-landed results file should
    mean "rotation due", not "policy violation")."""
    rounds: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rno = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        if as_of is not None and rno > as_of:
            continue
        with open(path) as f:
            rounds[rno] = json.load(f)
    last_green: dict[str, int] = {}
    for rno, data in sorted(rounds.items()):
        for name, res in data.items():
            ok = (
                res.get("rows_match")
                and res.get("schema_match")
                and res.get("hash_match")
                and not res.get("err")
            )
            if ok:
                last_green[name] = max(last_green.get(name, 0), rno)
            else:
                last_green.setdefault(name, 0)
    return last_green, (max(rounds) if rounds else 0)


def registered() -> list[str]:
    sys.path.insert(0, REPO)
    from etl_lealone_spark.workloads import all_workloads

    return list(all_workloads())


# Workloads whose implementing module changed materially since their
# last driver-green row — promoted WITHIN their staleness stratum
# (their old evidence certifies code that no longer exists). Updated per
# round from `git diff --stat <last-verdict>..HEAD -- etl_lealone_spark`:
# r04 touched multimodal/jpeg/similarity/pipeline/joins/catalog (entries
# whose workloads got r05-green rows under that code were dropped);
# r06 touched dedup.py connected-components convergence (decimal-sum
# wrap hardening) — only the CC-cluster workloads run that path.
MODULE_CHANGED: frozenset[str] = frozenset(
    {
        # dropped r12: the entire r11 set (10 streaming workloads +
        # dsir/kmeans x2/pca/bpe from the r10 kernels and logreg/ols/
        # ann_ivfpq/pq_adc from the r11 kernels) — all 19 got fully-green
        # CORRECTNESS_r11 rows under the changed code, and no
        # etl_lealone_spark module changed between that driver run and
        # the r11 close (dfb032d added round files only), so their
        # evidence certifies exactly the code in tree. Empty set = the
        # r12 window is pure staleness rotation (leads with the
        # 41-workload r07 stratum).
    }
)


# Workloads promoted into the window ahead of their natural staleness
# stratum for a stated, verdict-level reason (NOT module drift — that is
# MODULE_CHANGED). r12: minhash_band_skew carries the round's only
# perf-weak grade (driver bench 6.34s vs its r10 record 2.49s on
# untouched code); a fresh correctness row removes the
# stale-evidence variable from that investigation (r11 verdict task 2).
# Entries are dropped the round after they green.
PROMOTED: frozenset[str] = frozenset({"minhash_band_skew"})


def propose_window(last_green: dict[str, int], names: list[str]) -> list[str]:
    """Evidence-invalid-first, then oldest-evidence-first: never-checked
    (incl. brand-new) workloads lead, then MODULE_CHANGED workloads
    (their green row certifies code that no longer exists — r10 verdict
    task 2 hardened this from within-stratum promotion to stratum 0:
    a 50-slot window of genuinely-older strata would otherwise never
    reach a changed kernel sitting in a young stratum), then ascending
    last-green round; names break ties deterministically."""
    return propose_priority(last_green, names)[:WINDOW]


def propose_priority(last_green: dict[str, int], names: list[str]) -> list[str]:
    """Full registration order: the window policy applied to ALL
    workloads, so the tail is already sorted for the NEXT round's
    rotation."""
    def key(n: str):
        lg = last_green.get(n, 0)
        invalid = lg == 0 or n in MODULE_CHANGED
        # PROMOTED: pseudo-stratum 1 — after invalid evidence, before
        # every real round stratum (rounds start at 1 but no real
        # stratum is ever younger than the window policy's reach)
        stratum = 0 if invalid else (1 if n in PROMOTED else lg)
        return (
            stratum,                   # invalid evidence = stratum 0
            0 if lg == 0 else 1,       # truly-never-checked lead it
            n,
        )

    return sorted(names, key=key)


def main() -> int:
    argv = sys.argv[1:]
    as_of = None
    if "--as-of" in argv:
        i = argv.index("--as-of")
        as_of = int(argv[i + 1])
        del argv[i : i + 2]
    mode = argv[0] if argv else "ledger"
    last_green, latest = load_ledger(as_of)
    names = registered()

    if mode == "ledger":
        print(f"{'workload':40s} last_green  age(rounds)")
        for n in sorted(names, key=lambda n: (last_green.get(n, 0), n)):
            lg = last_green.get(n, 0)
            age = "never" if lg == 0 else str(latest - lg)
            print(f"{n:40s} r{lg:02d}        {age}")
        from collections import Counter

        dist = Counter(last_green.get(n, 0) for n in names)
        print("\nlast-green distribution:", dict(sorted(dist.items())))
        return 0

    if mode == "window":
        for n in propose_window(last_green, names):
            print(n)
        return 0

    if mode == "priority":
        # emit the full _PRIORITY tuple body, window first, ready to
        # paste into workloads/__init__.py
        ordered = propose_priority(last_green, names)
        for i, n in enumerate(ordered):
            sep = "    # ---- window boundary (slot 50) ----"
            if i == WINDOW:
                print(sep)
            print(f'    "{n}",')
        return 0

    if mode == "check":
        from etl_lealone_spark.workloads import _PRIORITY

        registered_set = set(names)
        actual = [n for n in _PRIORITY if n in registered_set][:WINDOW]
        actual_set = set(actual)
        proposed = set(propose_window(last_green, names))
        extra = [n for n in actual if n not in proposed]
        if extra and as_of is None and latest > 1:
            # A window is authored from the evidence available at authoring
            # time; the next round's results file landing does not make it
            # retroactively wrong. If the window matches the as-of-previous-
            # round policy, report "rotation due" (exit 0) instead of a
            # violation (r5 advisor finding).
            prev_green, _ = load_ledger(latest - 1)
            prev_proposed = set(propose_window(prev_green, names))
            if not [n for n in actual if n not in prev_proposed]:
                print(
                    f"ROTATION DUE: window matched policy as of r{latest - 1:02d}; "
                    f"CORRECTNESS_r{latest:02d}.json has landed since — regenerate "
                    f"_PRIORITY with 'python scripts/evidence_ledger.py priority' "
                    f"before the next driver run."
                )
                print(f"window size: {len(actual)}")
                return 0
        stale_out = sorted(
            (n for n in names if n not in actual_set),
            key=lambda n: last_green.get(n, 0),
        )[: len(extra)]
        if extra:
            print(
                f"DEVIATION: {len(extra)} window slots deviate from "
                f"strict oldest-first: {extra}"
            )
            print(f"           (displacing, by policy, oldest-out: {stale_out})")
        in_window_never = [n for n in actual if last_green.get(n, 0) == 0]
        print(f"window size: {len(actual)}; never-checked in window: "
              f"{len(in_window_never)}")
        oldest_covered = min(
            (last_green.get(n, 0) for n in actual if last_green.get(n, 0)),
            default=0,
        )
        oldest_out = min(
            (last_green.get(n, 0) for n in names if n not in actual_set),
            default=0,
        )
        print(f"oldest evidence inside window: r{oldest_covered:02d}; "
              f"oldest left outside: r{oldest_out:02d}")
        # non-zero on deviation so 'check' can actually gate (r5 advisor)
        return 1 if extra else 0

    print(__doc__)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
