"""Driver-contract guards for bench.py's compact stdout line.

The driver's tail capture bounds the line at ~2000 chars; per-query data
ships under short aliases so all rows fit (r13/r14 had to drop the map,
leaving PERF per-query-blind). These tests need no Spark session.
"""

from __future__ import annotations

import json


def _bench_module():
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
    )
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_bench_query_has_unique_alias():
    bench = _bench_module()
    rows = bench.BENCH_QUERIES + [f"ingest_{bench.INGEST_RECORDS}"]
    missing = [q for q in rows if q not in bench.QUERY_ALIASES]
    assert not missing, f"queries without an alias: {missing}"
    aliases = list(bench.QUERY_ALIASES.values())
    assert len(aliases) == len(set(aliases)), "alias collision"


def test_compact_line_fits_driver_tail_budget():
    bench = _bench_module()
    rows = bench.BENCH_QUERIES + [f"ingest_{bench.INGEST_RECORDS}"]
    # Worst case: every value at maximum 1-decimal width the suite could
    # plausibly produce (999.9s per row, 4-digit total).
    compact = {
        "metric": "headline_suite_seconds",
        "value": 9999.999,
        "unit": "sec",
        "queries": {bench.QUERY_ALIASES[q]: 999.9 for q in rows},
        "sf": 0.1,
        "ingest_records_per_sec": 999999,
    }
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) <= 1900, f"compact line {len(line)} chars > 1900 budget"
