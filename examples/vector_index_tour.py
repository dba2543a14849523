#!/usr/bin/env python
"""Persisted ANN indexes, end to end, on the local testdata.

embeddings.parquet -> build a PQ index into a commit-log store (codes
are 8 bytes/vector — 32x under the raw float32s) -> maintain it from a
Structured Streaming source EXACTLY ONCE -> probe with ADC (the raw
vectors are never re-read) -> sanity-check against exact brute force.
Then the same lifecycle for IVF (zone-map-pruned probes).

At 100 TB the shape is the point: training happens once per retrain
cadence (or offline — pass ``codebooks=``), the stream keeps the index
fresh between retrains via SetTransaction watermarks, and query-time
cost is a scan of the codes table, which is ~3% the size of the corpus.

Run: python examples/vector_index_tour.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyairbyte_spark import get_spark
from pyairbyte_spark.ann_fixtures import INT_SCALE, PQ_CODEBOOKS
from pyairbyte_spark.operators import similarity
from pyairbyte_spark.streaming.sink import VectorIndexStreamingSink
from pyairbyte_spark.writers import CommitLogTableStore


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("vector-index-tour")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    store = CommitLogTableStore(spark, tempfile.mkdtemp("vecidx"), "tour")

    # -- 1. build: codebooks + codes land in commit-log tables ----------
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    info = similarity.build_pq_index(
        seed, store, "emb", int_scale=INT_SCALE, codebooks=PQ_CODEBOOKS
    )
    print(f"built PQ index: {info}")

    # -- 2. stream the rest in, exactly once ----------------------------
    src = tempfile.mkdtemp("vecsrc")
    emb.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/b0")
    sink = VectorIndexStreamingSink(store, "emb", "tour-pipe", kind="pq")
    q = sink.attach(
        spark.readStream.schema(emb.schema).parquet(f"{src}/*"),
        checkpoint_dir=tempfile.mkdtemp("ckpt"),
    )
    q.awaitTermination(120)
    print(
        f"streamed in {sink.appended} vectors "
        f"(codes table now {store.table_stats('emb_codes')['rows']} rows)"
    )

    # -- 3. probe: ADC over codes only -----------------------------------
    queries = emb.filter(F.col("vec_id") < 3)
    approx = similarity.pq_index_topk(store, "emb", queries, k=5)
    exact = similarity.brute_force_topk(emb, queries, k=5)
    print("PQ top-5 (query 0):")
    approx.filter("query_id = 0").orderBy("rank").show()
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    print(f"recall@5 vs exact: {len(a & e) / len(e):.2f}")

    # -- 4. the IVF variant: zone-map-pruned probes -----------------------
    similarity.build_ivf_index(
        emb, store, "emb_ivf", n_centroids=8, iters=1, train_modulus=4,
        target_files=8,  # zone-map granularity: each list owns files
    )
    plan = store.plan_scan("emb_ivf_lists", [("cid", "in", (0, 1))])
    print(
        f"IVF probe file pruning: {plan['files_selected']}"
        f"/{plan['files_total']} files read for 2 of 8 lists"
    )
    similarity.ivf_index_topk(
        store, "emb_ivf", queries, k=5, n_probes=2
    ).filter("query_id = 0").orderBy("rank").show()

    # -- 5. (round 12) the vector indexes FOLLOW table DML ----------------
    # Attach to a store table; deletes/updates on the TABLE flow into
    # the index as one atomic sync (sign tombstones in the frozen
    # quantizer's cells — zero index I/O to derive).
    store.write_append(emb, "corpus", ["vec_id"])
    similarity.attach_ivf_index(
        store, "corpus", "live_ivf", n_centroids=8, iters=1,
        train_modulus=4,
    )
    store.merge_into(
        "corpus",
        emb.filter(F.col("vec_id") % 5 == 0).select("vec_id"),
        ["vec_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    s = similarity.sync_ivf_index(store, "live_ivf")
    print(f"IVF sync: {s['docs_changed']} vectors retracted atomically")
    debt = similarity.ivf_index_debt(store, "live_ivf")
    print(f"tombstone debt {debt['tombstone_fraction']:.1%} -> fold")
    f = similarity.fold_ivf_index(store, "live_ivf")
    print(
        f"fold: {f['folded']}, debt now "
        f"{similarity.ivf_index_debt(store, 'live_ivf')['tombstone_fraction']:.1%}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
