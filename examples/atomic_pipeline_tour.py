#!/usr/bin/env python
"""Atomic pipelines tour: multi-table transactions, atomic
multi-stream sync, and dedup-at-ingest.

The round-10 consistency layer end to end:

1. an atomic multi-TABLE transaction updates clean + per-type tallies
   together — readers never see one without the other, an aborted
   group (even one staged into both tables) leaves zero trace;
2. a crashed coordinator is force-aborted by the next writer — the
   table never wedges;
3. an atomic multi-STREAM sync lands a whole source's streams (and
   its cursors) all-or-nothing;
4. a persisted MinHash-LSH index answers "is this new batch a
   near-duplicate of anything already ingested" in O(touched
   buckets), maintained exactly-once by appends that move the bands
   and signatures tables as one transaction group;
5. ExactSubstr span removal cuts corpus-duplicated token spans.

Run: ``python examples/atomic_pipeline_tour.py``
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from pyairbyte_spark import SparkCache, get_spark
from pyairbyte_spark.operators import dedup
from pyairbyte_spark.sources import SourceFaker
from pyairbyte_spark.writers import CommitLogTableStore, TxnGroupAbortedError


def main() -> None:
    spark = get_spark("atomic-pipeline-tour")
    store = CommitLogTableStore(spark, tempfile.mkdtemp(), "tour")
    store.TXN_RESOLVE_GRACE_S = 0.5

    # -- 1. atomic multi-table transaction --------------------------------
    events = spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 3).cast("string").alias("kind"),
        (F.col("id") * 2).alias("value"),
    )
    with store.begin_txn() as txn:
        txn.write_append(events, "clean")
        txn.write_append(
            events.groupBy("kind").agg(F.count(F.lit(1)).alias("n")),
            "by_kind",
        )
        # inside the transaction neither table is visible yet
        assert not store.table_exists("clean")
    assert store.read("clean").count() == 100
    print("1. atomic txn: clean + by_kind flipped together")

    # an aborted group leaves zero trace, even though it staged data
    bad = events.withColumn("value", F.col("value") * 1000)
    t2 = store.begin_txn()
    t2.write_append(bad, "clean")
    t2.write_append(bad.groupBy("kind").count(), "by_kind")
    t2.abort()
    assert store.read("clean").count() == 100
    print("2a. aborted group: zero trace in both tables")

    # -- 2. crashed coordinator: writer-driven recovery --------------------
    t3 = store.begin_txn()
    t3.write_append(events, "clean")  # staged: no slot held yet
    t3.prepare()  # slot claimed... and the process "dies" before deciding
    store.write_append(events.limit(5), "clean")  # contender force-aborts
    assert store.read("clean").count() == 105
    try:
        t3.commit()
    except TxnGroupAbortedError:
        print("2b. crashed coordinator force-aborted; table never wedged")

    # -- 3. atomic multi-stream sync ---------------------------------------
    cache = SparkCache(spark, tempfile.mkdtemp(), table_format="commitlog")
    result = SourceFaker(seed=7, count=300).read(cache, atomic=True)
    heads = {s: cache.table_history(s)[0] for s in ("users", "purchases")}
    assert (
        heads["users"]["txn_group"] == heads["purchases"]["txn_group"]
    ), "one decision file landed the whole sync"
    print(f"3. atomic sync: {result.record_counts} in one txn group")

    # -- 4. dedup at ingest ------------------------------------------------
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "pack my box with five dozen liquor jugs right now"),
            (3, "sphinx of black quartz judge my vow said the king"),
        ],
        ["doc_id", "text"],
    )
    dedup.build_minhash_index(docs, store, "mh")
    incoming = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy cat tonight")],
        ["doc_id", "text"],
    )
    hits = dedup.minhash_index_matches(store, "mh", incoming, min_agree=6)
    print("4. near-dup check before ingest:", hits.collect())
    dedup.append_to_minhash_index(incoming, store, "mh", txn=("ingest", 1))
    replay = dedup.append_to_minhash_index(
        incoming, store, "mh", txn=("ingest", 1)
    )
    assert replay["skipped"], "replayed batch skipped — exactly-once"

    # -- 5. ExactSubstr span removal ---------------------------------------
    dup_docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta unique one"),
            (2, "alpha beta gamma delta epsilon zeta eta theta other tail"),
        ],
        ["doc_id", "text"],
    )
    cleaned = dedup.remove_duplicate_spans(dup_docs, n=8)
    for row in cleaned.orderBy("doc_id").collect():
        print(
            f"5. doc {row['doc_id']}: removed {row['n_removed']} of "
            f"{row['n_tokens']} tokens -> {row['cleaned_text']!r}"
        )

    # -- 6. merge INSIDE a transaction (round 11) --------------------------
    # The raw -> clean -> agg step with a MERGE in the middle: all three
    # verbs stage first and the group's slot-holding window is one PUT
    # burst, so contenders never force-abort a group mid-Spark-job.
    upd = (
        spark.range(40, 60)
        .select(
            F.col("id").alias("event_id"),
            F.lit("9").alias("kind"),
            (F.col("id") * 7).alias("value"),
        )
        .withColumn("_airbyte_raw_id", F.col("event_id").cast("string"))
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
    )
    with store.begin_txn() as txn:
        txn.write_append(upd, "raw_log")
        txn.write_merge(upd, "clean_m", ["event_id"])
        txn.write_replace(
            upd.groupBy("kind").agg(F.sum("value").alias("total")), "agg_m"
        )
    assert store.read("clean_m").count() == 20
    print("6. append+merge+replace landed as one group (deferred claims)")

    # -- 7. atomic schema migration (round 11) ------------------------------
    # ADD COLUMN on raw + backfilled merge on clean in ONE group: a
    # reader joining both never sees the half-migrated state.
    with store.begin_txn() as txn:
        txn.add_column("raw_log", "source_tag", "string", default="legacy")
        txn.write_merge(
            upd.withColumn("quality", F.col("value") * 2), "clean_m",
            ["event_id"],
        )
    assert {r["source_tag"] for r in store.read("raw_log").collect()} == {
        "legacy"
    }
    print("7. schema migration: ADD COLUMN + backfill flipped together")

    # -- 8. dedup-index maintenance lifecycle (round 11) --------------------
    cov = dedup.minhash_index_coverage(store, "mh")
    r = dedup.refresh_minhash_index(store, "mh")
    health = dedup.minhash_index_health(store, "mh")
    print(
        f"8. index coverage {cov['coverage']:.0%} -> refresh "
        f"(ran={r['refreshed']}) -> {health['coverage']:.0%}, "
        f"healthy={health['healthy']}"
    )
    print("tour complete")


if __name__ == "__main__":
    main()
