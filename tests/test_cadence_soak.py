"""Streaming soak of the full index-maintenance cadence (r14
directive #6): ``StoreStreamingSink(sync_indexes=True)`` with all four
index families attached, sustained mixed DML over many epochs, a
doctor-prescribed compact mid-soak, and an injected restart.

What must hold at steady state:

- exactly-once: the injected replay epoch lands no rows and never
  ticks twice; final table row count is exact;
- the per-tick diff stays ENTRY-PRUNED: late ticks consult no more
  source files than early ticks (cost tracks the epoch's churn, not
  the accumulated corpus) — and the tick straight after the doctor's
  compact consults ZERO source files (rewrite-transparent window);
- debt folds triggered by the sink's tombstone threshold actually
  complete: no family's tombstone debt ratchets upward across the
  soak;
- every probe family answers exactly from the final corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.operators.dedup import (
    attach_minhash_index,
    minhash_index_health,
    minhash_index_matches,
)
from pyairbyte_spark.operators.search import (
    attach_text_index,
    text_index_health,
    text_index_search,
)
from pyairbyte_spark.operators.similarity import (
    attach_ivf_index,
    attach_pq_index,
    ivf_index_debt,
    ivf_index_topk,
    pq_index_debt,
)
from pyairbyte_spark.operators.text import bm25_scores
from pyairbyte_spark.streaming.sink import StoreStreamingSink
from pyairbyte_spark.writers import CommitLogTableStore

DIM = 8


def _docs(spark, lo, hi):
    return spark.createDataFrame(
        [
            (
                i,
                f"document {i} about topic {i % 5} mentioning "
                f"keyword {i % 11} twice keyword",
                [((i * 31 + j * 7 + 13) % 17) / 17.0 for j in range(DIM)],
            )
            for i in range(lo, hi)
        ],
        "doc_id long, text string, embedding array<double>",
    )


@pytest.mark.slow
def test_cadence_soak(spark, tmp_path):
    store = CommitLogTableStore(
        spark, str(tmp_path / "wh"), "main", merge_buckets=8
    )
    store.write_append(_docs(spark, 0, 120), "docs", ["doc_id"])
    attach_text_index(store, "docs", "ti")
    attach_minhash_index(store, "docs", "mh")
    attach_ivf_index(store, "docs", "iv", id_col="doc_id", n_centroids=4)
    attach_pq_index(store, "docs", "pq", id_col="doc_id", m=4, ksub=8)

    # spy: per-tick count of source files the sync diffs consulted
    consulted: list[int] = []
    tick_files = [0]
    orig_entries = store._entries_df

    def spy(table, entries, **kw):
        if table == "docs":
            tick_files[0] += sum(
                len(e.get("files") or [1]) for e in entries
            )
        return orig_entries(table, entries, **kw)

    store._entries_df = spy

    sink = StoreStreamingSink(
        store,
        "docs",
        "soak",
        primary_keys=["doc_id"],
        sync_indexes=True,
        sync_tombstone_max=0.25,
    )
    deleted: set[int] = set()
    lo = 1000
    for epoch in range(10):
        batch = _docs(spark, lo, lo + 30)
        if epoch and epoch % 3 == 0:
            # churn: delete a slice of the previous epoch's docs
            doom = list(range(lo - 30, lo - 30 + 12))
            store.merge_into(
                "docs",
                spark.createDataFrame([(i,) for i in doom], "doc_id long"),
                ["doc_id"],
                when_matched_delete=True,
                when_not_matched_insert=False,
            )
            deleted.update(doom)
        tick_files[0] = 0
        sink(batch, epoch)
        consulted.append(tick_files[0])
        lo += 30
        if epoch == 4:
            # injected restart: a fresh sink with the SAME app_id
            # replays the last epoch — no rows, no second tick
            sink = StoreStreamingSink(
                store,
                "docs",
                "soak",
                primary_keys=["doc_id"],
                sync_indexes=True,
                sync_tombstone_max=0.25,
            )
            n_before = store.read("docs").count()
            tick_files[0] = 0
            sink(batch, epoch)
            assert sink.skipped_epochs == 1 and tick_files[0] == 0
            assert store.read("docs").count() == n_before
        if epoch == 6:
            # doctor window: a maintenance compact mid-soak; the NEXT
            # tick's diff must be rewrite-transparent — zero source
            # files read for a window holding only the rewrite
            store.compact("docs", sort_by=["doc_id"])
            from pyairbyte_spark.streaming.index_sync import (
                IndexSyncFollower,
            )

            tick_files[0] = 0
            IndexSyncFollower(store, source_table="docs").process_once()
            assert tick_files[0] == 0, (
                "post-compact tick read source data"
            )
    assert sink.sync_errors == 0
    # exactly-once row accounting
    assert store.read("docs").count() == 120 + 10 * 30 - len(deleted)
    # entry-pruned steady state: late ticks consult no more files than
    # early ticks (cost tracks churn, not corpus size)
    early, late = consulted[:3], consulted[-3:]
    assert max(late) <= max(max(early), 1) * 2, consulted
    # debt never ratchets past the fold threshold at steady state
    assert (
        text_index_health(store, "ti").get("tombstone_fraction") or 0
    ) <= 0.5
    assert (
        minhash_index_health(store, "mh").get("tombstone_fraction") or 0
    ) <= 0.5
    assert (ivf_index_debt(store, "iv").get("tombstone_fraction") or 0) <= 0.5
    assert (pq_index_debt(store, "pq").get("tombstone_fraction") or 0) <= 0.5
    # every family answers exactly from the final corpus
    cur = store.read("docs").select("doc_id", "text")
    terms = ["document", "keyword", "topic"]
    assert sorted(
        map(tuple, text_index_search(store, "ti", terms).collect())
    ) == sorted(map(tuple, bm25_scores(cur, terms).collect()))
    gone = sorted(deleted)[0]
    q = _docs(spark, gone, gone + 1).withColumn(
        "doc_id", F.lit(-1).cast("long")
    )
    # template-similar LIVE docs may legitimately match the text; the
    # deleted doc itself must be retracted
    match_ids = {
        r["match_id"]
        for r in minhash_index_matches(store, "mh", q).collect()
    }
    assert gone not in match_ids
    qv = _docs(spark, gone, gone + 1).select("doc_id", "embedding")
    hits = ivf_index_topk(
        store, "iv", qv, id_col="doc_id", k=3, n_probes=4
    )
    assert gone not in {r["neighbor_id"] for r in hits.collect()}
