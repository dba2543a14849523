#!/usr/bin/env python
"""sf1 regression gate: compare BENCH.json's sf1 section against the
recorded baseline (SF1_BASELINE.json) with a +/-20% alarm.

Why sf1 and not sf0.1: half the sf0.1 suite runs in under a second,
where medians are noise-bound (the round-5 audit measured ~0.3s
run-to-run spread); the sf1 queries are multi-second, so a 20% move is
signal. This is the round-over-round performance gate — run it after
``python bench.py`` (which records the sf1 section), and refresh the
baseline with ``--update`` once a slowdown is understood and accepted
(e.g. an operator doing strictly more work, like round 6's Gopher
completion).

Exit codes: 0 = no regression (improvements are reported, never
fatal); 1 = at least one query slowed >20%; 2 = missing inputs.

Usage: python scripts/sf1_regression.py [--update] [bench_json] [baseline_json]
"""

from __future__ import annotations

import json
import os
import sys

THRESHOLD = 0.20


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--update"]
    update = "--update" in sys.argv[1:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_path = args[0] if len(args) > 0 else os.path.join(repo, "BENCH.json")
    base_path = (
        args[1] if len(args) > 1 else os.path.join(repo, "SF1_BASELINE.json")
    )
    try:
        bench = json.load(open(bench_path))
    except (OSError, ValueError) as e:
        print(f"cannot read {bench_path}: {e}", file=sys.stderr)
        return 2
    sf1 = (bench.get("sf1") or {}).get("queries")
    if not sf1:
        print(f"{bench_path} has no sf1 section (SPARK_GRAFT_SF1_SKIP set?)",
              file=sys.stderr)
        return 2
    try:
        base = json.load(open(base_path))
    except OSError:
        base = None

    if base is None or update:
        json.dump(
            {"round": bench.get("round"), "queries": sf1},
            open(base_path, "w"),
            indent=1,
        )
        print(f"baseline {'updated' if base else 'initialized'}: {base_path}")
        if not update:
            return 0
        base = {"queries": sf1}

    rows = []
    regressions = []
    for name, cur in sorted(sf1.items()):
        prev = base["queries"].get(name)
        if prev is None:
            rows.append((name, None, cur, "NEW"))
            continue
        delta = (cur - prev) / prev
        mark = f"{delta:+.0%}"
        if delta > THRESHOLD:
            mark += "  << REGRESSION"
            regressions.append(name)
        elif delta < -THRESHOLD:
            mark += "  (improved)"
        rows.append((name, prev, cur, mark))
    for name, prev in sorted(base["queries"].items()):
        if name not in sf1:
            rows.append((name, prev, None, "DROPPED"))

    w = max(len(r[0]) for r in rows)
    print(f"{'query':<{w}}  {'base_s':>8}  {'now_s':>8}  delta")
    for name, prev, cur, mark in rows:
        p = f"{prev:8.2f}" if prev is not None else "       -"
        c = f"{cur:8.2f}" if cur is not None else "       -"
        print(f"{name:<{w}}  {p}  {c}  {mark}")
    if regressions:
        print(
            f"\n{len(regressions)} sf1 regression(s) > {THRESHOLD:.0%}: "
            + ", ".join(regressions),
            file=sys.stderr,
        )
        return 1
    print("\nno sf1 regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
