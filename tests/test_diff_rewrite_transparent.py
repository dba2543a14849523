"""Rewrite-transparent snapshot diffs (r14): ``compact`` / rebucket /
metadata-only commits are row-preserving by construction, so
``diff_snapshots`` peels them off the window's ends before entry
pruning. Without this, a doctor-prescribed compaction between two sync
cursors shares ZERO entries between the endpoints and the next tick
pays a full-table digest anti-join that provably nets to nothing — the
one O(table) term the r13 audit left in the 100 TB maintenance cadence.

Gates: a compact-only window is an empty diff with ZERO data-file
reads (poisoned); compact-suffix and compact-prefix windows keep the
touched-buckets pruning of the DML beside them; aborted txn-group
prepares peel without ever becoming a manifest source; mid-window
rewrites and undecided prepares fall back to the (correct) full read;
an index sync straight after a compact does no source data I/O.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.writers import CommitLogTableStore


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(
        spark, str(tmp_path / "wh"), "main", merge_buckets=8
    )


def _rows(spark, lo, hi, tag="a"):
    return spark.createDataFrame(
        [(i, f"{tag}{i}") for i in range(lo, hi)], "id long, v string"
    )


def _diff(store, v0, v1, *, prune=True):
    old = store.DIFF_ENTRY_PRUNE
    store.DIFF_ENTRY_PRUNE = prune
    try:
        df = store.diff_snapshots("t", v0, v1, ["id"])
        return (
            None
            if df is None
            else sorted(
                (r["id"], r["v"], r["_change_type"]) for r in df.collect()
            )
        )
    finally:
        store.DIFF_ENTRY_PRUNE = old


def _poison_reads(store, monkeypatch, table="t"):
    orig = store._entries_df

    def guard(tbl, entries, **kw):
        if tbl == table:
            raise AssertionError(f"changeless window read {tbl} data")
        return orig(tbl, entries, **kw)

    monkeypatch.setattr(store, "_entries_df", guard)


def test_compact_only_window_is_empty_diff_zero_io(
    spark, store, monkeypatch
):
    store.write_append(_rows(spark, 0, 300), "t", ["id"])
    store.write_append(_rows(spark, 300, 400), "t", ["id"])
    v2 = store.latest_version("t")
    store.compact("t", sort_by=["id"])
    store.compact("t")  # a second rewrite: chains peel too
    v3 = store.latest_version("t")
    _poison_reads(store, monkeypatch)
    df = store.diff_snapshots("t", v2, v3, ["id"])
    assert df is not None and df.count() == 0
    assert {"id", "v", "_change_type", "_commit_version"} <= set(df.columns)


def test_compact_suffix_peeled_keeps_bucket_pruning(
    spark, store, monkeypatch
):
    """[cursor] -> one-key delete -> compact -> [head]: the compact is
    peeled, entry pruning runs against the PRE-compact manifest, and
    only the touched bucket's files are read — never the rewritten
    full layout."""
    store.write_append(_rows(spark, 0, 400), "t", ["id"])
    v0 = store.latest_version("t")
    store.merge_into(
        "t",
        spark.createDataFrame([(7,)], "id long"),
        ["id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    v_dml = store.latest_version("t")
    store.compact("t", sort_by=["id"])
    v1 = store.latest_version("t")
    man0 = store._read_manifest("t", v0)
    man_dml = store._read_manifest("t", v_dml)
    carried = {e["path"] for e in man0["entries"]} & {
        e["path"] for e in man_dml["entries"]
    }
    assert carried
    full = {
        e["path"]: set(e.get("buckets") or ())
        for e in man0["entries"] + man_dml["entries"]
    }
    seen: list[tuple[str, tuple]] = []
    orig = store._entries_df

    def spy(table, entries, **kw):
        seen.extend(
            (e["path"], tuple(e.get("buckets") or ())) for e in entries
        )
        return orig(table, entries, **kw)

    monkeypatch.setattr(store, "_entries_df", spy)
    assert _diff(store, v0, v1) == [(7, "a7", "delete")]
    # no post-compact dir was ever consulted
    compacted = {e["path"] for e in store._read_manifest("t", v1)["entries"]}
    assert all(p not in compacted - carried for p, _b in seen)
    for path, buckets in seen:
        if path in carried:
            assert 0 < len(buckets) < len(full[path])
    assert all(len(b) == 1 for _p, b in seen)


def test_compact_prefix_peeled_keeps_bucket_pruning(
    spark, store, monkeypatch
):
    """[cursor] -> compact -> one-key delete -> [head]: the compact is
    peeled off the FRONT, pruning runs post-compact-manifest vs head."""
    store.write_append(_rows(spark, 0, 400), "t", ["id"])
    v0 = store.latest_version("t")
    store.compact("t", sort_by=["id"])
    v_c = store.latest_version("t")
    store.merge_into(
        "t",
        spark.createDataFrame([(7,)], "id long"),
        ["id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    v1 = store.latest_version("t")
    man_c = store._read_manifest("t", v_c)
    man1 = store._read_manifest("t", v1)
    carried = {e["path"] for e in man_c["entries"]} & {
        e["path"] for e in man1["entries"]
    }
    assert carried
    pre = {e["path"] for e in store._read_manifest("t", v0)["entries"]}
    seen: list[str] = []
    orig = store._entries_df

    def spy(table, entries, **kw):
        seen.extend(e["path"] for e in entries)
        return orig(table, entries, **kw)

    monkeypatch.setattr(store, "_entries_df", spy)
    assert _diff(store, v0, v1) == [(7, "a7", "delete")]
    # the pre-compact layout is never read: identity rebased onto v_c
    assert not (set(seen) & (pre - carried))


def test_mid_window_rewrite_composes_segments(spark, store, monkeypatch):
    """DML -> compact -> DML (a lagging follower crossing a
    maintenance window): the window splits at the rewrite and the
    per-segment entry-pruned diffs COMPOSE — exact values, and the
    pre-compact layout's untouched dirs are never read (it used to be
    a full-table read)."""
    store.write_append(_rows(spark, 0, 400), "t", ["id"])
    v0 = store.latest_version("t")
    store.merge_into(
        "t",
        spark.createDataFrame([(3,)], "id long"),
        ["id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    store.compact("t", sort_by=["id"])
    store.write_append(_rows(spark, 200, 205, tag="n"), "t")
    v1 = store.latest_version("t")
    man0 = store._read_manifest("t", v0)
    full0 = {
        e["path"]: set(e.get("buckets") or ())
        for e in man0["entries"]
    }
    seen: list[tuple[str, tuple]] = []
    orig = store._entries_df

    def spy(table, entries, **kw):
        seen.extend(
            (e["path"], tuple(e.get("buckets") or ())) for e in entries
        )
        return orig(table, entries, **kw)

    monkeypatch.setattr(store, "_entries_df", spy)
    got = _diff(store, v0, v1, prune=True)
    assert got == [(3, "a3", "delete")] + [
        (i, f"n{i}", "insert") for i in range(200, 205)
    ]
    # the delete's segment reads only the touched bucket of the
    # pre-compact layout — never its full bucket set
    for path, buckets in seen:
        if path in full0:
            assert 0 < len(buckets) < len(full0[path]), (
                f"pre-compact dir {path} read with liveness {buckets}"
            )


def test_segment_composition_semantics(spark, store):
    """The compose cases that differ from naive concatenation:
    insert-then-delete nets to NOTHING, delete-then-reinsert of the
    SAME values is digest-suppressed, update-then-update emits the
    FINAL values with the ORIGINAL preimage, update-then-delete
    deletes with the window-initial values."""
    store.write_append(_rows(spark, 0, 100), "t", ["id"])
    v0 = store.latest_version("t")
    # segment 1 (pre-compact)
    store.write_append(_rows(spark, 500, 505, tag="x"), "t")  # 500..504 insert
    store.merge_into(  # delete 10..11 (one later reinserted identical)
        "t",
        spark.createDataFrame([(10,), (11,)], "id long"),
        ["id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    store.merge_into(  # update 20 -> B20
        "t",
        _rows(spark, 20, 21, tag="B"),
        ["id"],
        when_matched_update={"v": "s.v"},
    )
    store.compact("t", sort_by=["id"])
    # segment 2 (post-compact)
    store.merge_into(  # delete the fresh inserts 500..502
        "t",
        spark.createDataFrame([(i,) for i in (500, 501, 502)], "id long"),
        ["id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    store.write_append(  # reinsert 10 with its ORIGINAL value
        spark.createDataFrame([(10, "a10")], "id long, v string"), "t"
    )
    store.merge_into(  # update 20 again -> C20
        "t",
        _rows(spark, 20, 21, tag="C"),
        ["id"],
        when_matched_update={"v": "s.v"},
    )
    v1 = store.latest_version("t")
    got = _diff(store, v0, v1, prune=True)
    want = sorted(
        [
            (503, "x503", "insert"),
            (504, "x504", "insert"),
            (11, "a11", "delete"),
            (20, "C20", "update_postimage"),
        ]
    )
    assert got == want
    # preimages carry the WINDOW-INITIAL values through the compose
    d = store.diff_snapshots("t", v0, v1, ["id"], include_preimages=True)
    pre = sorted(
        (r["id"], r["v"])
        for r in d.filter(
            d["_change_type"] == "update_preimage"
        ).collect()
    )
    assert pre == [(20, "a20")]


def test_aborted_prepare_peels_but_never_sources_manifest(
    spark, store, monkeypatch
):
    """cursor -> compact -> ABORTED txn prepare -> head(compact): the
    window nets to nothing; the aborted prepare's manifest (garbage —
    the prepared state) must never be read as an endpoint."""
    store.TXN_RESOLVE_GRACE_S = 0.2
    store.write_append(_rows(spark, 0, 100), "t", ["id"])
    v0 = store.latest_version("t")
    store.compact("t", sort_by=["id"])
    t = store.begin_txn()
    t.write_append(_rows(spark, 900, 950), "t")
    t.prepare()
    t.abort()
    store.compact("t")
    v1 = store.latest_version("t")
    _poison_reads(store, monkeypatch)
    df = store.diff_snapshots("t", v0, v1, ["id"])
    assert df is not None and df.count() == 0


def test_undecided_prepare_blocks_peeling_stays_correct(spark, store):
    """An UNDECIDED txn-group prepare inside the window could still
    flip to commit — no peeling may happen near it; the diff must
    still answer (full read) without leaking the prepared rows."""
    store.TXN_RESOLVE_GRACE_S = 30.0  # keep it undecided for the test
    store.write_append(_rows(spark, 0, 100), "t", ["id"])
    v0 = store.latest_version("t")
    store.compact("t", sort_by=["id"])
    t = store.begin_txn()
    t.write_append(_rows(spark, 900, 950), "t")
    t.prepare()
    try:
        v1 = store.latest_version("t")
        got = _diff(store, v0, v1, prune=True)
        assert got == []
    finally:
        t.abort()


def test_sync_after_compact_zero_source_io(spark, store, monkeypatch):
    """The VERDICT scenario: doctor compacts between two index syncs —
    the next sync tick must not read ANY source data files."""
    from pyairbyte_spark.operators.dedup import (
        attach_minhash_index,
        minhash_index_matches,
        sync_minhash_index,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i} body w{i % 7} w{i % 11} w{i % 13} w{i % 5}")
         for i in range(200)],
        "doc_id long, text string",
    )
    store.write_append(docs, "docs", ["doc_id"])
    attach_minhash_index(store, "docs", "mh")
    store.compact("docs", sort_by=["doc_id"])
    _poison_reads(store, monkeypatch, table="docs")
    r = sync_minhash_index(store, "mh")
    assert r["docs_changed"] == 0
    monkeypatch.undo()
    # and the index still answers
    q = docs.filter(F.col("doc_id") == 7).withColumn(
        "doc_id", F.lit(-1).cast("long")
    )
    assert minhash_index_matches(store, "mh", q).count() > 0
