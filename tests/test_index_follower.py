"""IndexSyncFollower (round-13 directive #5): attached indexes follow
source DML without manual sync calls. The follower is stateless — the
cursor is the index meta, committed inside the sync's txn group — so
exactly-once per epoch is the sync protocol's watermark CAS, and a
replayed tick is a pure-metadata no-op.
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
    text_index_search,
)
from pyairbyte_spark.operators.text import bm25_scores
from pyairbyte_spark.streaming.index_sync import IndexSyncFollower
from pyairbyte_spark.writers import CommitLogTableStore


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path / "wh"), "main")


def _docs(spark, lo, hi):
    return spark.createDataFrame(
        [
            (i, f"document {i} about topic {i % 5} mentioning "
                f"keyword {i % 11} twice keyword")
            for i in range(lo, hi)
        ],
        "doc_id long, text string",
    )


TERMS = ["document", "keyword", "topic"]


def _scores(df):
    return sorted(map(tuple, df.collect()))


def test_follower_syncs_all_attached_indexes_one_tick(spark, store):
    store.write_append(_docs(spark, 0, 40), "docs", ["doc_id"])
    attach_text_index(store, "docs", "ti")
    attach_minhash_index(store, "docs", "mh")
    # an UNattached index must be ignored by discovery
    from pyairbyte_spark.operators.search import build_text_index

    build_text_index(_docs(spark, 0, 5), store, "free")
    store.merge_into(
        "docs",
        spark.createDataFrame([(i,) for i in range(0, 8)], "doc_id long"),
        ["doc_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    store.write_append(_docs(spark, 100, 110), "docs")
    f = IndexSyncFollower(store, tombstone_max=None)
    r = f.process_once()
    assert set(r["synced"]) == {"ti", "mh"}
    assert r["synced"]["ti"]["docs_changed"] == 18
    # probes match a full scan over the live corpus
    cur = store.read("docs").select("doc_id", "text")
    assert _scores(text_index_search(store, "ti", TERMS)) == _scores(
        bm25_scores(cur, TERMS)
    )
    q = _docs(spark, 3, 4).withColumn("doc_id", F.lit(-1).cast("long"))
    assert minhash_index_matches(store, "mh", q).count() == 0  # deleted


def test_replayed_tick_is_noop_and_caught_up_is_metadata_only(
    spark, store, monkeypatch
):
    store.write_append(_docs(spark, 0, 20), "docs", ["doc_id"])
    attach_text_index(store, "docs", "ti")
    store.write_append(_docs(spark, 20, 25), "docs")
    f = IndexSyncFollower(store)
    r1 = f.process_once()
    assert r1["synced"]["ti"]["docs_changed"] == 5
    # replayed epoch: the cursor already advanced inside the sync's
    # txn group — the tick is a no-op AND never invokes the sync
    # (caught-up costs one latest_version metadata read per index)
    from pyairbyte_spark.operators import search as search_mod

    def boom(*a, **k):  # pragma: no cover
        raise AssertionError("caught-up tick attempted a sync")

    monkeypatch.setattr(search_mod, "sync_text_index", boom)
    r2 = f.process_once()
    assert r2 == {"synced": {}, "folded": [], "behind": 0}


def test_follower_run_drains_and_stops(spark, store):
    store.write_append(_docs(spark, 0, 20), "docs", ["doc_id"])
    attach_minhash_index(store, "docs", "mh")
    store.write_append(_docs(spark, 20, 30), "docs")
    f = IndexSyncFollower(store)
    results = f.run(poll_interval=0.0, stop_when_caught_up=True)
    assert results[0]["synced"]["mh"]["docs_changed"] == 10
    assert results[-1] == {"synced": {}, "folded": [], "behind": 0}


def test_debt_threshold_triggers_auto_fold(spark, store):
    """Sustained delete churn crosses the doctor's tombstone threshold
    and the follower folds in the same tick — probe cost stays flat."""
    store.write_append(_docs(spark, 0, 60), "docs", ["doc_id"])
    attach_minhash_index(store, "docs", "mh")
    store.merge_into(
        "docs",
        spark.createDataFrame([(i,) for i in range(0, 25)], "doc_id long"),
        ["doc_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    f = IndexSyncFollower(store, tombstone_max=0.1)
    r = f.process_once()
    assert r["folded"] == ["mh"]
    h = minhash_index_health(store, "mh")
    assert h["tombstone_fraction"] == 0.0 and h["coverage"] == 1.0
    # the fold kept the index exact
    q = _docs(spark, 30, 31).withColumn("doc_id", F.lit(-1).cast("long"))
    assert minhash_index_matches(store, "mh", q).count() > 0


def test_two_followers_one_window_applies_once(spark, store, monkeypatch):
    """Two followers racing the same window: the sync protocol's
    watermark CAS lets exactly one apply; the loser reports 'behind'
    and the next tick sees a caught-up index. Simulated
    deterministically: the loser's sync runs against a cursor another
    follower already advanced."""
    from pyairbyte_spark.operators import search as search_mod

    store.write_append(_docs(spark, 0, 20), "docs", ["doc_id"])
    attach_text_index(store, "docs", "ti")
    store.write_append(_docs(spark, 20, 24), "docs")
    f1 = IndexSyncFollower(store)
    f2 = IndexSyncFollower(store)
    real_sync = search_mod.sync_text_index
    state = {"n": 0}

    def interleaved(st, name, **kw):
        # f1's first sync: f2 wins the window just before it runs
        if state["n"] == 0:
            state["n"] += 1
            r2 = f2.process_once()
            assert r2["synced"]["ti"]["docs_changed"] == 4
        return real_sync(st, name, **kw)

    monkeypatch.setattr(search_mod, "sync_text_index", interleaved)
    import pyairbyte_spark.streaming.index_sync as isync

    monkeypatch.setattr(
        isync,
        "_family_fns",
        lambda kind: (
            interleaved,
            search_mod.text_index_health,
            search_mod.fold_text_index,
        ),
    )
    r1 = f1.process_once()
    # f1 saw the head ahead of the (stale) cursor, called sync, and the
    # engine short-circuited on the advanced cursor: window applied ONCE
    assert r1["synced"] == {} and r1["behind"] == 0
    cur = store.read("docs").select("doc_id", "text")
    assert _scores(text_index_search(store, "ti", TERMS)) == _scores(
        bm25_scores(cur, TERMS)
    )


def test_store_sink_syncs_attached_indexes_per_epoch(
    spark, store, monkeypatch
):
    """StoreStreamingSink(sync_indexes=True): streaming ingest keeps
    the TABLE's attached indexes current per applied epoch — scoped to
    this table, no tick on replayed epochs, exactly-once end to end."""
    from pyairbyte_spark.operators import search as search_mod
    from pyairbyte_spark.streaming.sink import StoreStreamingSink

    store.write_append(_docs(spark, 0, 20), "docs", ["doc_id"])
    attach_text_index(store, "docs", "ti")
    # an attached index on ANOTHER table must be out of this sink's scope
    store.write_append(_docs(spark, 1000, 1010), "other", ["doc_id"])
    attach_minhash_index(store, "other", "mh_other")
    other_cursor = int(
        store.read("mh_other_meta").collect()[0]["synced_version"]
    )
    sink = StoreStreamingSink(
        store, "docs", "pipe", primary_keys=["doc_id"], sync_indexes=True
    )
    sink(_docs(spark, 20, 30), 0)
    cur = store.read("docs").select("doc_id", "text")
    assert _scores(text_index_search(store, "ti", TERMS)) == _scores(
        bm25_scores(cur, TERMS)
    )
    assert (
        int(store.read("mh_other_meta").collect()[0]["synced_version"])
        == other_cursor
    )
    # replayed epoch: data append skipped AND no sync attempted
    def boom(*a, **k):  # pragma: no cover
        raise AssertionError("replayed epoch ticked the follower")

    monkeypatch.setattr(search_mod, "sync_text_index", boom)
    sink(_docs(spark, 20, 30), 0)
    assert sink.skipped_epochs == 1 and sink.sync_errors == 0
    monkeypatch.undo()
    # next epoch lands data + sync together
    sink(_docs(spark, 30, 35), 1)
    cur = store.read("docs").select("doc_id", "text")
    assert cur.count() == 35
    assert _scores(text_index_search(store, "ti", TERMS)) == _scores(
        bm25_scores(cur, TERMS)
    )
    # a failing tick never fails the epoch: data still lands
    monkeypatch.setattr(
        sink._follower,
        "process_once",
        lambda: (_ for _ in ()).throw(RuntimeError("sync hiccup")),
    )
    sink(_docs(spark, 35, 40), 2)
    assert sink.sync_errors == 1
    assert store.read("docs").count() == 40


def test_tick_computes_one_diff_for_coattached_families(
    spark, store, monkeypatch
):
    """r14: four families co-attached at the same cursor share ONE
    entry-pruned diff per tick (it used to be one per family — 4x the
    diff I/O on every maintenance window at 100 TB)."""
    from pyairbyte_spark.operators.similarity import (
        attach_ivf_index,
        attach_pq_index,
        ivf_index_topk,
    )

    dim = 8
    docs = spark.createDataFrame(
        [
            (
                i,
                f"document {i} about topic {i % 5} mentioning "
                f"keyword {i % 11} twice keyword",
                [((i * 31 + j * 7 + 13) % 17) / 17.0 for j in range(dim)],
            )
            for i in range(0, 60)
        ],
        "doc_id long, text string, embedding array<double>",
    )
    store.write_append(docs, "docs", ["doc_id"])
    attach_text_index(store, "docs", "ti")
    attach_minhash_index(store, "docs", "mh")
    attach_ivf_index(store, "docs", "iv", id_col="doc_id", n_centroids=4)
    attach_pq_index(store, "docs", "pq", id_col="doc_id", m=4, ksub=8)
    store.merge_into(
        "docs",
        spark.createDataFrame([(i,) for i in range(0, 6)], "doc_id long"),
        ["doc_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    calls: list[tuple] = []
    orig = CommitLogTableStore.diff_snapshots

    def spy(self, table, v0, v1, *a, **k):
        calls.append((table, v0, v1))
        return orig(self, table, v0, v1, *a, **k)

    monkeypatch.setattr(CommitLogTableStore, "diff_snapshots", spy)
    f = IndexSyncFollower(store, tombstone_max=None)
    r = f.process_once()
    assert set(r["synced"]) == {"ti", "mh", "iv", "pq"}
    assert len([c for c in calls if c[0] == "docs"]) == 1
    # every family applied the shared diff
    cur = store.read("docs").select("doc_id", "text")
    assert _scores(text_index_search(store, "ti", TERMS)) == _scores(
        bm25_scores(cur, TERMS)
    )
    q = spark.createDataFrame(
        [(0, [((3 * 31 + j * 7 + 13) % 17) / 17.0 for j in range(dim)])],
        "doc_id long, embedding array<double>",
    )
    hits = ivf_index_topk(
        store, "iv", q, id_col="doc_id", k=3, n_probes=4
    )
    assert 3 not in {r["neighbor_id"] for r in hits.collect()}  # deleted


def test_tick_unequal_cursors_diff_separately(spark, store, monkeypatch):
    """Indexes at DIFFERENT cursors can't share a diff — the cache
    keys on the window, so a just-attached index diffs its own
    (shorter) window while an older one diffs the longer window."""
    store.write_append(_docs(spark, 0, 30), "docs", ["doc_id"])
    attach_text_index(store, "docs", "ti")
    store.write_append(_docs(spark, 100, 110), "docs")
    attach_minhash_index(store, "docs", "mh")  # cursor = later version
    store.write_append(_docs(spark, 200, 210), "docs")
    calls: list[tuple] = []
    orig = CommitLogTableStore.diff_snapshots

    def spy(self, table, v0, v1, *a, **k):
        calls.append((table, v0, v1))
        return orig(self, table, v0, v1, *a, **k)

    monkeypatch.setattr(CommitLogTableStore, "diff_snapshots", spy)
    r = IndexSyncFollower(store, tombstone_max=None).process_once()
    assert set(r["synced"]) == {"ti", "mh"}
    docs_calls = sorted(c for c in calls if c[0] == "docs")
    assert len(docs_calls) == 2
    assert docs_calls[0][1] != docs_calls[1][1]  # different cursors
    cur = store.read("docs").select("doc_id", "text")
    assert _scores(text_index_search(store, "ti", TERMS)) == _scores(
        bm25_scores(cur, TERMS)
    )


def test_caught_up_tick_runs_zero_spark_jobs(spark, store):
    """r14 guard: a caught-up follower tick is pure driver-side
    metadata — the per-index meta reads take the read_rows_local fast
    path, so the tick launches ZERO Spark jobs (it used to pay a 1-job
    collect per index per tick even when fully caught up)."""
    store.write_append(_docs(spark, 0, 20), "docs", ["doc_id"])
    attach_text_index(store, "docs", "ti")
    attach_minhash_index(store, "docs", "mh")
    f = IndexSyncFollower(store)
    f.process_once()  # drain anything pending; now caught up
    sc = spark.sparkContext
    sc.setJobGroup("caught-up-tick-guard", "zero-job tick")
    r = f.process_once()
    sc.setJobGroup("post-guard", "")
    assert r == {"synced": {}, "folded": [], "behind": 0}
    jobs = sc.statusTracker().getJobIdsForGroup("caught-up-tick-guard")
    assert len(jobs) == 0, f"caught-up tick ran {len(jobs)} jobs"
