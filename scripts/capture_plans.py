#!/usr/bin/env python
"""Capture .explain("formatted") of each named query's returned frame.

Writes plans/r14/<query>_<tag>.txt. For lifecycle queries the captured
plan is the final probe/read — the part whose shape (PushedFilters,
join strategy, Exchange count) the optimization claims are about.

Run: python scripts/capture_plans.py <tag> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(__file__), "..", "plans", "r15")

DEFAULT = [
    "dedup_minhash_index_lookup",
    "text_index_sync_search",
    "text_index_wap_sync_search",
    "ann_ivf_sync_topk",
    "ann_pq_sync_topk",
    "dedup_minhash_refresh_events",
    "text_bm25_index_search",
    "graph_pagerank_part_supplier",
    "store_sum_tier_events",
    "store_incremental_agg_events",
    "q3_shipping_priority",
    "q1_pricing_summary",
]


def explain_str(df, mode="formatted") -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    from pyairbyte_spark import get_spark
    from pyairbyte_spark import queries as q

    spark = get_spark(
        "capture-plans", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    os.makedirs(OUT, exist_ok=True)
    registry = q.queries()
    for name in names:
        df = registry[name](spark, SF_DIR)
        txt = explain_str(df)
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
