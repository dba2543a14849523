#!/usr/bin/env python
"""Write-audit-publish branches + keyword search, end to end.

documents.parquet -> land the corpus on MAIN -> fork an ``ingest``
branch -> a full pipeline step runs ON THE BRANCH (dedup-style delete
merge + new-doc appends, even a Structured Streaming sink) while main
keeps serving the audited snapshot -> audit the branch (quality gate
over the candidate state) -> ONE publish commit flips main, and the
change feed reports the NET classified diff. Then the search half:
build a persisted inverted index, probe it with BM25 at
O(touched postings), keep it fresh with an exactly-once append, and
let the coverage watermark drive the tail refresh.

At 100 TB the shape is the point: a branch is a ~100-byte ref file, a
publish is one metadata PUT (entries are file references — no data
moves), the audit window costs main's readers nothing, and a search
probe opens the few postings files its terms live in.

Run: python examples/wap_and_search_tour.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyairbyte_spark import get_spark
from pyairbyte_spark.operators.search import (
    append_to_text_index,
    attach_text_index,
    build_text_index,
    fold_text_index,
    refresh_text_index,
    sync_text_index,
    text_index_coverage,
    text_index_health,
    text_index_search,
)
from pyairbyte_spark.writers import CommitLogTableStore


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("wap-search-tour")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    store = CommitLogTableStore(spark, tempfile.mkdtemp("wap"), "tour")

    # -- 1. main serves the audited corpus -------------------------------
    store.write_append(docs, "docs", ["doc_id"])
    v0 = store.latest_version("docs")
    print(f"main @ v{v0}: {store.count_where('docs')['count']} docs "
          "(counted from the manifest — zero files read)")

    # -- 2. the pipeline step runs on a branch ---------------------------
    store.create_branch("docs", "ingest")
    bv = store.branch("ingest")
    # a cleaning merge: drop the non-English slice (candidate decision)
    bv.merge_into(
        "docs",
        docs.filter(F.col("lang") != "en").select("doc_id"),
        ["doc_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    # and fresh documents append
    bv.write_append(
        spark.createDataFrame(
            [(10_000_001, "fresh spark document about data", "en")],
            "doc_id long, text string, lang string",
        ),
        "docs",
        ["doc_id"],
    )
    print(
        f"branch candidate: {bv.count_where('docs')['count']} docs; "
        f"main still serves {store.count_where('docs')['count']}"
    )

    # -- 3. audit, then ONE commit publishes ------------------------------
    bad = bv.read("docs").filter(F.col("lang") != "en").count()
    assert bad == 0, "audit failed — branch never publishes"
    v = store.publish_branch("docs", "ingest")
    net = store.read_changes("docs", v0, v).groupBy("_change_type").count()
    print(f"published @ v{v}; net change feed:")
    net.show()

    # -- 4. keyword search over the published corpus ----------------------
    corpus = store.read("docs").select("doc_id", "text")
    info = build_text_index(corpus, store, "idx", target_files=16)
    print(f"inverted index: {info}")
    hits = text_index_search(store, "idx", ["spark", "data"], limit=5)
    print("top-5 BM25:")
    hits.show(truncate=60)
    plan = store.plan_scan("idx_postings", [("token", "in", ["spark", "data"])])
    print(f"probe opened {plan['files_selected']}/{plan['files_total']} "
          "postings files (token-clustered zone maps)")

    # -- 5. exactly-once ingest-time maintenance --------------------------
    more = spark.createDataFrame(
        [(10_000_002, "another spark data document")],
        "doc_id long, text string",
    )
    append_to_text_index(more, store, "idx", txn=("tour", 1))
    replay = append_to_text_index(more, store, "idx", txn=("tour", 1))
    assert replay["skipped"], "replayed batch must be a no-op"
    cov = text_index_coverage(store, "idx")
    print(f"coverage after append: {cov['coverage']:.2%} "
          f"({cov['files_unclustered']} unclustered)")
    r = refresh_text_index(store, "idx")
    print(f"tail refresh -> {r['coverage']:.2%}")

    # -- 6. the index FOLLOWS table DML, transactionally -------------------
    attach_text_index(store, "docs", "live_idx", target_files=16)
    store.merge_into(
        "docs",
        store.read("docs").filter(F.col("doc_id") % 9 == 0).select("doc_id"),
        ["doc_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    s = sync_text_index(store, "live_idx")
    print(f"sync: {s['docs_changed']} docs retracted/re-signed in one "
          "atomic step (postings tombstones + stats delta + cursor)")
    h = text_index_health(store, "live_idx")
    print(f"health: tombstone debt {h['tombstone_fraction']:.1%}, "
          f"issues: {h['issues'] or 'none'}")
    f = fold_text_index(store, "live_idx")
    print(f"fold: {f['folded']} -> debt "
          f"{text_index_health(store, 'live_idx')['tombstone_fraction']:.1%}")

    # -- 7. an index can follow a BRANCH through its publish ---------------
    # (round 12) attach ref=...: the audit step queries its candidate
    # corpus through the same probes production uses; the publish
    # re-homes the index onto main with zero spurious diff.
    store.create_branch("docs", "audit2")
    attach_text_index(store, "docs", "audit_idx", target_files=16, ref="audit2")
    bv2 = store.branch("audit2")
    bv2.write_append(
        spark.createDataFrame(
            [(10_000_003, "branch-only spark data doc")],
            "doc_id long, text string",
        ),
        "docs",
        ["doc_id"],
    )
    s_branch = sync_text_index(store, "audit_idx")  # follows the branch
    print(f"branch-following sync: {s_branch['docs_changed']} docs "
          "(main never saw them)")
    store.publish_branch("docs", "audit2")
    s_main = sync_text_index(store, "audit_idx")  # re-homes onto main
    print(f"post-publish sync re-homed the index: docs_changed="
          f"{s_main['docs_changed']} (the publish manifest IS the tip)")

    # -- 8. aggregates from the manifest + the warehouse doctor ------------
    agg = store.agg_where(
        "docs", [("min", "doc_id"), ("max", "doc_id"), ("count", "*")]
    )
    print(f"agg_where answered {agg['aggs']} reading "
          f"{agg['files_scanned']} of {agg['files_total']} files")
    plan = store.store_maintenance_plan()
    n_actions = sum(len(v) for v in plan["tables"].values()) + sum(
        len(v["actions"]) for v in plan["indexes"].values()
    )
    print(f"warehouse doctor: {len(plan['indexes'])} indexes tracked, "
          f"{n_actions} maintenance actions pending, "
          f"{plan['txn_decisions']['files']} txn decision files")


if __name__ == "__main__":
    main()
