"""Entry-pruned snapshot diffs (r13): ``diff_snapshots`` reads ONLY
the entries that changed between the endpoint manifests — data dirs
are immutable, so a dir shared by both manifests contributes identical
rows to both sides of the digest anti-join and provably no diff rows.
This is what keeps follower / index-sync catch-up O(changed dirs)
instead of O(table) at 100 TB. Gates: byte-equality with the
full-read path across DML mixes, a plan gate that common dirs are
never scanned, the provably-empty window short-circuit, and the
DV-bearing degrade.
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


def test_pruned_diff_equals_full_read_across_dml_mix(spark, store):
    store.write_append(_rows(spark, 0, 400), "t", ["id"])
    v0 = store.latest_version("t")
    # window: delete a slice, update a slice, append fresh, plus a
    # row-silent metadata commit
    store.merge_into(
        "t",
        spark.createDataFrame([(i,) for i in range(0, 40)], "id long"),
        ["id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    store.merge_into(
        "t",
        _rows(spark, 40, 80, tag="B"),
        ["id"],
        when_matched_update={"v": "s.v"},
    )
    store.write_append(_rows(spark, 1000, 1050), "t")
    store.set_cluster_by("t", ["id"])
    v1 = store.latest_version("t")
    got = _diff(store, v0, v1, prune=True)
    want = _diff(store, v0, v1, prune=False)
    assert got == want
    kinds = {c for _i, _v, c in got}
    assert kinds == {"insert", "update_postimage", "delete"}
    assert sum(1 for *_x, c in got if c == "delete") == 40
    assert sum(1 for *_x, c in got if c == "insert") == 50


def test_pruned_diff_scans_only_touched_buckets(spark, store, monkeypatch):
    """Plan gate: a one-key merge narrows the carried dir's liveness —
    the diff reads ONLY the touched bucket's files on each side, never
    the untouched buckets (file-level pruned via per-file bucket
    tags)."""
    store.write_append(_rows(spark, 0, 400), "t", ["id"])
    v0 = store.latest_version("t")
    store.merge_into(
        "t",
        spark.createDataFrame([(7,)], "id long"),
        ["id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    v1 = store.latest_version("t")
    man0 = store._read_manifest("t", v0)
    man1 = store._read_manifest("t", v1)
    carried = {e["path"] for e in man0["entries"]} & {
        e["path"] for e in man1["entries"]
    }
    assert carried  # incremental merge: untouched dir carried by ref
    seen: list[tuple[str, tuple]] = []
    orig = store._entries_df

    def spy(table, entries, **kw):
        seen.extend(
            (e["path"], tuple(e.get("buckets") or ())) for e in entries
        )
        return orig(table, entries, **kw)

    monkeypatch.setattr(store, "_entries_df", spy)
    d = _diff(store, v0, v1)
    assert d == [(7, "a7", "delete")]
    # the carried dir may be consulted, but only with its DIFFERING
    # bucket liveness — never the full set
    full = {
        e["path"]: set(e.get("buckets") or ())
        for e in man0["entries"] + man1["entries"]
    }
    for path, buckets in seen:
        if path in carried:
            assert 0 < len(buckets) < len(full[path]), (
                f"carried dir {path} read with liveness {buckets}"
            )
    # one touched bucket: each consulted entry carries exactly it
    assert all(len(b) == 1 for _p, b in seen)


def test_identical_manifests_yield_empty_diff_without_reading(
    spark, store, monkeypatch
):
    """A metadata-only window (cluster property flip) is PROVABLY
    changeless: the diff is an empty frame — no file I/O, and not None
    (None would send followers to per-commit replay)."""
    store.write_append(_rows(spark, 0, 50), "t", ["id"])
    v0 = store.latest_version("t")
    store.set_cluster_by("t", ["id"])
    v1 = store.latest_version("t")
    monkeypatch.setattr(
        store,
        "_entries_df",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("empty window read data")
        ),
    )
    df = store.diff_snapshots("t", v0, v1, ["id"])
    assert df is not None and df.count() == 0
    assert {"id", "v", "_change_type", "_commit_version"} <= set(df.columns)


def test_dv_bearing_endpoints_read_full(spark, store):
    """Merge-on-read DVs make 'identical entry' a lie (per-manifest DV
    state can differ on a shared dir): both endpoints bearing DVs must
    degrade to the full read — and stay exact."""
    store.write_append(_rows(spark, 0, 100), "t", ["id"])
    store.delete_where("t", [[("id", "<", 5)]], mode="mor")
    v0 = store.latest_version("t")
    store.delete_where("t", [[("id", "<", 10)]], mode="mor")
    v1 = store.latest_version("t")
    got = _diff(store, v0, v1, prune=True)
    assert got == [(i, f"a{i}", "delete") for i in range(5, 10)]


def test_sync_rides_pruned_diff(spark, store, monkeypatch):
    """The index-sync engine inherits the pruning: a one-doc delete on
    a many-dir table syncs without scanning the untouched dirs."""
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
    v0 = store.latest_version("docs")
    store.merge_into(
        "docs",
        spark.createDataFrame([(7,)], "doc_id long"),
        ["doc_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    man0 = store._read_manifest("docs", v0)
    man1 = store._read_manifest("docs", store.latest_version("docs"))
    carried = {e["path"] for e in man0["entries"]} & {
        e["path"] for e in man1["entries"]
    }
    assert carried  # multi-bucket layout: untouched dir carried by ref
    full = {
        e["path"]: set(e.get("buckets") or ())
        for e in man0["entries"] + man1["entries"]
    }
    seen: list[tuple[str, tuple]] = []
    orig = store._entries_df

    def spy(table, entries, **kw):
        if table == "docs":
            seen.extend(
                (e["path"], tuple(e.get("buckets") or ())) for e in entries
            )
        return orig(table, entries, **kw)

    monkeypatch.setattr(store, "_entries_df", spy)
    r = sync_minhash_index(store, "mh")
    assert r["docs_changed"] == 1
    for path, buckets in seen:
        if path in carried:
            assert 0 < len(buckets) < len(full[path]), (
                "sync diff scanned unchanged buckets"
            )
    q = docs.filter(F.col("doc_id") == 7).withColumn(
        "doc_id", F.lit(-1).cast("long")
    )
    assert minhash_index_matches(store, "mh", q).count() == 0
