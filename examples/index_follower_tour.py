#!/usr/bin/env python
"""Index auto-sync tour: attached derived indexes follow their source
tables' DML with no manual sync calls.

The round-13 cadence layer end to end:

1. a documents table gets a text (BM25) and a MinHash near-dup index,
   an embeddings table gets an IVF index — all ATTACHED (the index
   meta records the source table and the snapshot it covers);
2. ordinary DML lands on the source tables — appends, updates,
   deletes via MERGE;
3. ONE ``IndexSyncFollower.process_once()`` catches every index up:
   each sync moves O(diff) rows and commits index tables + cursor as
   one txn group (a racing probe sees the whole step or none of it);
4. a replayed tick is a no-op (the cursor lives in the index meta,
   inside the sync's own transaction — the follower holds no state);
5. sustained delete churn crosses the doctor's tombstone threshold
   and the follower folds the index automatically — probe cost stays
   flat without a separate maintenance cadence.

Run: ``python examples/index_follower_tour.py``
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from pyairbyte_spark import get_spark
from pyairbyte_spark.operators.dedup import (
    attach_minhash_index,
    minhash_index_health,
    minhash_index_matches,
)
from pyairbyte_spark.operators.search import (
    attach_text_index,
    text_index_search,
)
from pyairbyte_spark.operators.similarity import (
    attach_ivf_index,
    ivf_index_topk,
)
from pyairbyte_spark.streaming.index_sync import IndexSyncFollower
from pyairbyte_spark.writers import CommitLogTableStore


def main() -> None:
    spark = get_spark("index-follower-tour")
    wh = tempfile.mkdtemp()
    store = CommitLogTableStore(spark, wh, "tour")

    docs = spark.createDataFrame(
        [
            (i, f"document {i} about topic {i % 5} with keyword {i % 11}")
            for i in range(200)
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, [float((i * 31 + j * 7) % 17) / 17.0 for j in range(8)])
         for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    store.write_append(docs, "docs", ["doc_id"])
    store.write_append(emb, "emb", ["vec_id"])

    print("== 1. attach three indexes ==")
    attach_text_index(store, "docs", "ti")
    attach_minhash_index(store, "docs", "mh")
    attach_ivf_index(store, "emb", "ix", n_centroids=4)

    print("== 2. ordinary DML on the sources ==")
    store.merge_into(
        "docs",
        spark.createDataFrame([(i,) for i in range(0, 30)], "doc_id long"),
        ["doc_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    store.write_append(
        spark.createDataFrame(
            [(500, "a brand new document about spark followers")],
            "doc_id long, text string",
        ),
        "docs",
    )
    store.merge_into(
        "emb",
        spark.createDataFrame([(i,) for i in range(0, 10)], "vec_id long"),
        ["vec_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )

    print("== 3. one follower tick syncs everything ==")
    f = IndexSyncFollower(store, tombstone_max=0.1)
    r = f.process_once()
    print("   synced:", {k: v["docs_changed"] for k, v in r["synced"].items()})
    print("   auto-folded:", r["folded"])

    print("== 4. a replayed tick is a no-op ==")
    print("  ", f.process_once())

    print("== 5. probes see exactly the post-DML corpus ==")
    hits = text_index_search(store, "ti", ["spark", "followers"], limit=3)
    print("   bm25 top:", [tuple(x) for x in hits.collect()])
    q = spark.createDataFrame(
        [(-1, "document 7 about topic 2 with keyword 7")],
        "doc_id long, text string",
    )
    matches = {
        r_["match_id"] for r_ in minhash_index_matches(store, "mh", q).collect()
    }
    print(
        "   near-dups of deleted doc 7's text:",
        sorted(matches),
        "(template-similar LIVE docs may match; doc 7 itself is "
        f"retracted: {7 not in matches})",
    )
    qv = spark.createDataFrame(
        [(999, [0.4] * 8)], "vec_id long, embedding array<double>"
    )
    top = ivf_index_topk(store, "ix", qv, k=3, n_probes=4)
    print("   ann top-3:", [r_["neighbor_id"] for r_ in top.collect()])
    print(
        "   minhash health after auto-fold:",
        minhash_index_health(store, "mh")["tombstone_fraction"],
    )

    print("== 6. the doctor: review, then one call heals ==")
    # seed fresh debt with the auto-fold cadence OFF, the way an
    # operator-reviewed maintenance window would see it
    store.merge_into(
        "docs",
        spark.createDataFrame([(i,) for i in range(30, 80)], "doc_id long"),
        ["doc_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    IndexSyncFollower(store, tombstone_max=None).process_once()
    dry = store.apply_maintenance_plan(dry_run=True)
    print(
        "   review (dry run):",
        [(a["target"], a["action"]) for a in dry["actions"]],
    )
    # MCP parity: the apply_store_maintenance tool (what an agent
    # calls over MCP) must prescribe EXACTLY what the library does
    from pyairbyte_spark import tools
    from pyairbyte_spark.cache import SparkCache

    cache = SparkCache(
        spark, wh, schema_name="tour", table_format="commitlog"
    )
    via_tool = tools.apply_store_maintenance(cache, dry_run=True)
    lib_key = [(a["target"], a["action"], a["status"]) for a in dry["actions"]]
    mcp_key = [
        (a["target"], a["action"], a["status"]) for a in via_tool["actions"]
    ]
    assert mcp_key == lib_key, (mcp_key, lib_key)
    print("   MCP tool action list == library action list:", True)
    applied = store.apply_maintenance_plan()
    print(
        "   applied:",
        [
            (a["target"], a["action"], a["status"])
            for a in applied["actions"]
        ],
    )
    h = minhash_index_health(store, "mh")
    print("   minhash tombstones after heal:", h["tombstone_fraction"])


if __name__ == "__main__":
    main()
