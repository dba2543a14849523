"""Idempotent (exactly-once) streaming appends into the commit-log
store: Delta's SetTransaction pattern — a per-app batch watermark that
rides the SAME atomic conditional-PUT as the micro-batch's data.

Pinned here: replayed/racing batches never duplicate, watermarks are
monotone table state that survives every commit kind (appends by other
writers, DML rebases, metadata ops, compact, replace, restore), and a
real foreachBatch query through ``StoreStreamingSink`` lands each file
exactly once across a redelivered epoch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.streaming.sink import StoreStreamingSink
from pyairbyte_spark.writers import CommitLogTableStore


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path / "wh"), "main")


def _batch(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 2)


def test_replayed_batch_is_skipped(spark, store):
    r1 = store.write_append(_batch(spark, 0, 10), "t", txn=("app", 0))
    assert r1 == {"version": 1, "skipped": False}
    r2 = store.write_append(_batch(spark, 0, 10), "t", txn=("app", 0))
    assert r2["skipped"] is True
    assert store.read("t").count() == 10
    # an OLDER epoch replays after newer ones committed: still skipped
    store.write_append(_batch(spark, 10, 20), "t", txn=("app", 3))
    r3 = store.write_append(_batch(spark, 0, 10), "t", txn=("app", 1))
    assert r3["skipped"] is True
    assert store.read("t").count() == 20
    assert store.txn_version("t", "app") == 3
    assert store.txn_version("t", "other") == -1


def test_apps_are_independent(spark, store):
    store.write_append(_batch(spark, 0, 5), "t", txn=("a", 0))
    r = store.write_append(_batch(spark, 5, 10), "t", txn=("b", 0))
    assert r["skipped"] is False
    assert store.read("t").count() == 10
    assert store.txn_version("t", "a") == 0
    assert store.txn_version("t", "b") == 0


def test_watermark_survives_other_commits(spark, store):
    store.write_append(_batch(spark, 0, 100), "t", txn=("app", 7))
    store.write_append(_batch(spark, 100, 200), "t")  # plain append
    store.set_check("t", "id_ok", "id >= 0")
    store.delete_where("t", [("id", "<", 10)])  # COW DML
    store.delete_where("t", [("id", "<", 20)], mode="mor")
    store.rename_column("t", "v", "val")
    store.compact("t")
    store.write_replace(store.read("t"), "t")
    assert store.txn_version("t", "app") == 7
    r = store.write_append(_batch(spark, 0, 5), "t", txn=("app", 7))
    assert r["skipped"] is True


def test_restore_does_not_regress_watermark(spark, store):
    store.write_append(_batch(spark, 0, 10), "t", txn=("app", 0))  # v1
    store.write_append(_batch(spark, 10, 20), "t")  # v2
    store.write_append(_batch(spark, 20, 30), "t", txn=("app", 5))  # v3
    store.restore("t", 2)  # data back to v2; watermark must stay 5
    assert store.read("t").count() == 20
    assert store.txn_version("t", "app") == 5
    r = store.write_append(_batch(spark, 20, 30), "t", txn=("app", 5))
    assert r["skipped"] is True


def test_dml_rebase_does_not_regress_watermark(
    spark, store, tmp_path, monkeypatch
):
    """A DELETE staged against snapshot V races a txn append; the
    rebase carries the append's entries AND its advanced watermark."""
    store.write_append(_batch(spark, 0, 100), "t", txn=("app", 0))
    orig = CommitLogTableStore._commit
    fired = {"done": False}

    def race(self, table_name, manifest, version):
        if not fired["done"] and manifest.get("op") == "delete":
            fired["done"] = True
            other = CommitLogTableStore(spark, str(tmp_path / "wh"), "main")
            other.write_append(
                spark.range(1000, 1010).withColumn("v", F.lit(-1)),
                table_name,
                txn=("app", 9),
            )
        return orig(self, table_name, manifest, version)

    monkeypatch.setattr(CommitLogTableStore, "_commit", race)
    store.delete_where("t", [("id", "<", 10)])
    monkeypatch.undo()
    assert store.txn_version("t", "app") == 9
    r = store.write_append(_batch(spark, 0, 5), "t", txn=("app", 9))
    assert r["skipped"] is True
    assert store.read("t").count() == 100 - 10 + 10


def test_racing_same_batch_lands_once(spark, store, tmp_path, monkeypatch):
    """Two writers race the SAME (app, batch): the loser's retry loop
    re-reads the watermark and skips instead of double-appending."""
    store.write_append(_batch(spark, 0, 10), "t", txn=("app", 0))
    orig = CommitLogTableStore._commit
    fired = {"done": False}

    def race(self, table_name, manifest, version):
        if not fired["done"] and (manifest.get("txns") or {}).get("app") == 1:
            fired["done"] = True
            other = CommitLogTableStore(spark, str(tmp_path / "wh"), "main")
            other.write_append(
                _batch(spark, 10, 20), table_name, txn=("app", 1)
            )
        return orig(self, table_name, manifest, version)

    monkeypatch.setattr(CommitLogTableStore, "_commit", race)
    r = store.write_append(_batch(spark, 10, 20), "t", txn=("app", 1))
    monkeypatch.undo()
    assert r["skipped"] is True
    assert store.read("t").count() == 20


def test_foreachbatch_exactly_once_end_to_end(spark, store, tmp_path):
    """A real Structured Streaming file-source query through
    StoreStreamingSink, then a manual epoch redelivery (what a crash
    between the data commit and Spark's checkpoint advance produces):
    rows land exactly once."""
    src = tmp_path / "src"
    src.mkdir()
    spark.range(0, 50).withColumn("v", F.col("id")).coalesce(
        1
    ).write.mode("overwrite").parquet(str(src / "batch0"))
    sink = StoreStreamingSink(store, "s", "pipe")
    stream = (
        spark.readStream.schema("id long, v long")
        .parquet(str(src) + "/*")
    )
    q = sink.attach(
        stream, checkpoint_dir=str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)
    assert store.read("s").count() == 50
    last = store.txn_version("s", "pipe")
    assert last >= 0
    # redeliver the last epoch verbatim — exactly-once means a no-op
    sink(spark.range(0, 50).withColumn("v", F.col("id")), last)
    assert sink.skipped_epochs == 1
    assert store.read("s").count() == 50


def test_replace_and_merge_into_txn_idempotence(spark, store):
    """SetTransaction on the other write verbs: a replayed replace or
    merge_into batch is a no-op, and a replace never wipes another
    app's watermark."""
    store.write_append(_batch(spark, 0, 50), "t", txn=("ingest", 1))
    r = store.write_replace(_batch(spark, 0, 10), "t", txn=("rebuild", 0))
    assert r["skipped"] is False
    assert store.read("t").count() == 10
    r2 = store.write_replace(_batch(spark, 0, 99), "t", txn=("rebuild", 0))
    assert r2["skipped"] is True
    assert store.read("t").count() == 10
    # the other app's watermark survived the replace
    assert store.txn_version("t", "ingest") == 1
    assert store.txn_version("t", "rebuild") == 0
    src = _batch(spark, 5, 15).withColumn("v", F.lit(-1).cast("long"))
    m1 = store.merge_into(
        "t",
        src,
        ["id"],
        when_matched_update={"v": "s.v"},
        when_not_matched_insert=True,
        txn=("cdc", 7),
    )
    assert m1["updated"] == 5 and m1["inserted"] == 5
    m2 = store.merge_into(
        "t",
        src,
        ["id"],
        when_matched_update={"v": "s.v + 100"},
        when_not_matched_insert=True,
        txn=("cdc", 7),
    )
    assert m2.get("skipped") is True
    got = store.read("t")
    assert got.count() == 15
    assert got.filter("v = -1").count() == 10  # second merge never ran
    assert store.txn_version("t", "cdc") == 7


def test_vector_index_streaming_sink_exactly_once(spark, store, tmp_path):
    """A real streaming query maintains a PQ index exactly-once: build
    from a seed corpus, stream two appended batches through
    VectorIndexStreamingSink, then probing equals the batch-encoded
    path over the full corpus; a redelivered epoch is a no-op."""
    from pyairbyte_spark.ann_fixtures import INT_SCALE, PQ_CODEBOOKS
    from pyairbyte_spark.operators import similarity
    from pyairbyte_spark.streaming.sink import VectorIndexStreamingSink

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    seed = emb.filter(F.col("vec_id") % 3 == 0)
    similarity.build_pq_index(
        seed, store, "e", int_scale=INT_SCALE, codebooks=PQ_CODEBOOKS
    )
    src = tmp_path / "vecsrc"
    src.mkdir()
    emb.filter(F.col("vec_id") % 3 == 1).coalesce(1).write.parquet(
        str(src / "b0")
    )
    emb.filter(F.col("vec_id") % 3 == 2).coalesce(1).write.parquet(
        str(src / "b1")
    )
    sink = VectorIndexStreamingSink(store, "e", "vecpipe", kind="pq")
    stream = spark.readStream.schema(emb.schema).parquet(str(src) + "/*")
    q = sink.attach(
        stream, checkpoint_dir=str(tmp_path / "vckpt"), trigger_once=True
    )
    q.awaitTermination(120)
    assert store.table_stats("e_codes")["rows"] == emb.count()
    # redeliver the last epoch verbatim: exactly-once means a no-op
    last = store.txn_version("e_codes", "vecpipe")
    sink(emb.filter(F.col("vec_id") % 3 == 2), last)
    assert sink.skipped_epochs == 1
    assert store.table_stats("e_codes")["rows"] == emb.count()
    # probing the stream-maintained index == batch-encoded reference
    queries = emb.filter(F.col("vec_id") < 3)
    got = similarity.pq_index_topk(store, "e", queries, k=5)
    ref = similarity.pq_topk_int(
        similarity.pq_encode_int(emb, PQ_CODEBOOKS, int_scale=INT_SCALE),
        queries, PQ_CODEBOOKS, k=5, int_scale=INT_SCALE,
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, ref.collect())
    )


def test_vector_index_streaming_sink_ivf(spark, store, tmp_path):
    """Same exactly-once contract on the IVF lists table."""
    from pyairbyte_spark.operators import similarity
    from pyairbyte_spark.streaming.sink import VectorIndexStreamingSink

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    similarity.build_ivf_index(
        emb.filter(F.col("vec_id") % 2 == 0), store, "e",
        n_centroids=8, iters=1, train_modulus=4,
    )
    src = tmp_path / "ivfsrc"
    src.mkdir()
    emb.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.parquet(
        str(src / "b0")
    )
    sink = VectorIndexStreamingSink(store, "e", "ivfpipe", kind="ivf")
    stream = spark.readStream.schema(emb.schema).parquet(str(src) + "/*")
    q = sink.attach(
        stream, checkpoint_dir=str(tmp_path / "ickpt"), trigger_once=True
    )
    q.awaitTermination(120)
    assert store.table_stats("e_lists")["rows"] == emb.count()
    sink(emb.filter(F.col("vec_id") % 2 == 1), 0)  # replay epoch 0
    assert sink.skipped_epochs == 1
    assert store.table_stats("e_lists")["rows"] == emb.count()
    out = similarity.ivf_index_topk(
        store, "e", emb.filter(F.col("vec_id") < 2), k=5, n_probes=2
    )
    assert out.groupBy("query_id").count().filter("count != 5").count() == 0


def test_index_health_retrain_trigger_and_recall_recovery(
    spark, store, tmp_path
):
    """Round-10 #5: a FROZEN quantizer serving a drifted distribution
    must be detectable and recoverable. A real streaming query appends
    a drifted batch (negated cluster spikes — an orthogonal move the
    old codebooks cannot encode); the per-epoch quant_err observe
    metric and index_health() both trip; a retrain over the current
    corpus recovers probe recall. Data is deterministic (hash noise +
    modular cluster spikes), so the margins here are wide and stable."""
    from pyairbyte_spark.operators import similarity
    from pyairbyte_spark.streaming.sink import VectorIndexStreamingSink

    def clustered(lo, n, sign):
        # 16 clusters in 64 dims: cluster k spikes dims d%16==k by
        # sign*8, plus deterministic ±1 hash noise.
        return spark.range(lo, lo + n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda d: (
                    F.when(
                        d % 16 == F.col("id") % 16, F.lit(8.0 * sign)
                    ).otherwise(F.lit(0.0))
                    + ((F.col("id") * 31 + d * 7) % 11 - 5).cast("double")
                    / 5.0
                ),
            ).alias("embedding"),
        )

    base = clustered(0, 320, 1.0)
    drift = clustered(100_000, 320, -1.0)
    similarity.build_pq_index(base, store, "h", m=8, ksub=16, iters=2)
    h0 = similarity.index_health(store, "h")
    assert h0["retrain"] is None and h0["appended_rows"] == 0
    assert h0["baseline_err"] is not None and h0["baseline_err"] < 0.3

    # stream the drifted batch through the real sink
    src = tmp_path / "driftsrc"
    src.mkdir()
    drift.coalesce(1).write.parquet(str(src / "b0"))
    sink = VectorIndexStreamingSink(store, "h", "driftpipe", kind="pq")
    q = sink.attach(
        spark.readStream.schema(drift.schema).parquet(str(src) + "/*"),
        checkpoint_dir=str(tmp_path / "dckpt"),
        trigger_once=True,
    )
    q.awaitTermination(120)
    # the epoch's error rode the encode observe — no extra job
    assert sink.batch_quant_errs and (
        sink.batch_quant_errs[0] > 2 * h0["baseline_err"]
    )
    h1 = similarity.index_health(store, "h")
    assert h1["appended_rows"] == 320
    assert h1["ratio"] > 2 and h1["retrain"] is True

    # drifted-query recall before vs after the retrain
    qs = drift.filter(F.col("vec_id") < 100_008)
    full = base.unionByName(drift)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(full, qs, k=5).collect()
    }

    def recall(rows):
        got = {(r["query_id"], r["neighbor_id"]) for r in rows}
        return len(got & exact) / len(exact)

    before = recall(similarity.pq_index_topk(store, "h", qs, k=5).collect())
    similarity.build_pq_index(full, store, "h", m=8, ksub=32, iters=2)
    after = recall(similarity.pq_index_topk(store, "h", qs, k=5).collect())
    assert after > before and after >= 0.85, (before, after)
    h2 = similarity.index_health(store, "h")
    assert h2["retrain"] is None, "fresh build: nothing appended yet"


def test_index_health_ivf_same_distribution_stays_healthy(
    spark, store, tmp_path
):
    """IVF health recomputes assignment error from stored vectors: an
    append drawn from the SAME distribution must not trip retrain."""
    from pyairbyte_spark.operators import similarity

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    similarity.build_ivf_index(
        emb.filter(F.col("vec_id") % 2 == 0), store, "e",
        n_centroids=8, iters=1, train_modulus=4,
    )
    similarity.append_to_ivf_index(
        emb.filter(F.col("vec_id") % 2 == 1), store, "e", txn=("s", 0)
    )
    h = similarity.index_health(store, "e", kind="ivf")
    assert h["appended_rows"] > 0
    assert h["baseline_err"] is not None and h["recent_err"] is not None
    assert h["retrain"] is False, h
