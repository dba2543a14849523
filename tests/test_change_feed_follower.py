"""ChangeFeedFollower: incremental table-to-table pipelines with the
commit log as the write-ahead log and commit versions as the cursor."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.cache import SparkCache
from pyairbyte_spark.strategies import WriteMethod
from pyairbyte_spark.streaming import ChangeFeedFollower


@pytest.fixture()
def caches(spark, tmp_path):
    src = SparkCache(
        spark, warehouse_dir=str(tmp_path / "src"), table_format="commitlog"
    )
    dst = SparkCache(
        spark, warehouse_dir=str(tmp_path / "dst"), table_format="commitlog"
    )
    return src, dst


def _df(spark, rows, raw_prefix="r"):
    df = spark.createDataFrame(rows, ["id", "v"])
    return df.withColumn(
        "_airbyte_raw_id", F.concat(F.lit(raw_prefix), F.col("id").cast("string"))
    ).withColumn("_airbyte_extracted_at", F.current_timestamp())


def _rows(cache, stream):
    df = cache.store.read(cache.table_name(stream))
    return sorted((r["id"], r["v"]) for r in df.select("id", "v").collect())


def test_follower_applies_changes_incrementally(spark, caches):
    src, dst = caches
    t = src.table_name("raw")
    follower = ChangeFeedFollower(src, "raw", dst, "clean", primary_keys=["id"])

    src.store.write_merge(_df(spark, [(1, "a"), (2, "b")]), t, ["id"])
    res1 = follower.process_once()
    assert res1["rows"] == 2 and res1["to_version"] == 1
    assert _rows(dst, "clean") == [(1, "a"), (2, "b")]

    # caught up → no-op cycle
    assert follower.process_once()["rows"] == 0

    # incremental update flows through, only the delta is processed
    src.store.write_merge(_df(spark, [(1, "a2"), (3, "c")], "s"), t, ["id"])
    res2 = follower.process_once()
    assert res2["rows"] == 2 and res2["from_version"] == 1
    assert _rows(dst, "clean") == [(1, "a2"), (2, "b"), (3, "c")]


def test_follower_transform_hook(spark, caches):
    src, dst = caches
    t = src.table_name("raw")
    src.store.write_merge(_df(spark, [(1, "a"), (2, "b")]), t, ["id"])

    def upper(changes):
        return (
            changes.filter(F.col("_change_type") != "delete")
            .withColumn("v", F.upper("v"))
            .drop("_change_type", "_commit_version")
        )

    follower = ChangeFeedFollower(
        src, "raw", dst, "clean", transform=upper, primary_keys=["id"]
    )
    follower.process_once()
    assert _rows(dst, "clean") == [(1, "A"), (2, "B")]


def test_follower_crash_between_data_and_cursor_converges(spark, caches):
    """Kill the follower after the destination write but before the
    cursor commit; the replayed window must converge (merge)."""
    src, dst = caches
    t = src.table_name("raw")
    follower = ChangeFeedFollower(src, "raw", dst, "clean", primary_keys=["id"])
    src.store.write_merge(_df(spark, [(1, "a")]), t, ["id"])

    boom = RuntimeError("crash before cursor")
    real_commit = follower._commit_cursor

    def crashing_commit(version):
        raise boom

    follower._commit_cursor = crashing_commit
    with pytest.raises(RuntimeError, match="crash before cursor"):
        follower.process_once()
    # data landed, cursor did not
    assert _rows(dst, "clean") == [(1, "a")]
    assert follower.processed_version() == 0

    follower._commit_cursor = real_commit
    res = follower.process_once()  # replay
    assert res["rows"] == 1
    assert _rows(dst, "clean") == [(1, "a")]  # converged, no dupes
    assert follower.processed_version() == 1


def test_follower_chain_two_hops(spark, caches):
    """raw → clean → agg: each hop moves only its delta."""
    src, dst = caches
    t = src.table_name("raw")
    hop1 = ChangeFeedFollower(src, "raw", dst, "clean", primary_keys=["id"])

    def count_by_v(changes):
        return (
            changes.filter(F.col("_change_type") != "delete")
            .groupBy("v")
            .agg(F.count("*").alias("n"))
            .withColumn("_airbyte_raw_id", F.col("v"))
            .withColumn("_airbyte_extracted_at", F.current_timestamp())
        )

    hop2 = ChangeFeedFollower(
        dst, "clean", dst, "agg", transform=count_by_v, primary_keys=["v"]
    )
    src.store.write_merge(
        _df(spark, [(1, "x"), (2, "x"), (3, "y")]), t, ["id"]
    )
    hop1.process_once()
    hop2.process_once()
    agg = dst.store.read(dst.table_name("agg"))
    assert sorted((r["v"], r["n"]) for r in agg.select("v", "n").collect()) == [
        ("x", 2),
        ("y", 1),
    ]


def test_follower_run_stop_when_caught_up(spark, caches):
    src, dst = caches
    t = src.table_name("raw")
    src.store.write_merge(_df(spark, [(1, "a")]), t, ["id"])
    follower = ChangeFeedFollower(src, "raw", dst, "clean", primary_keys=["id"])
    results = follower.run(poll_interval=0.01, stop_when_caught_up=True)
    assert [r["rows"] for r in results] == [1, 0]


def test_follower_append_mode(spark, caches):
    src, dst = caches
    t = src.table_name("raw")
    follower = ChangeFeedFollower(
        src, "raw", dst, "log", method=WriteMethod.APPEND
    )
    src.store.write_append(_df(spark, [(1, "a")]), t)
    src.store.write_append(_df(spark, [(2, "b")]), t)
    follower.process_once()
    src.store.write_append(_df(spark, [(3, "c")]), t)
    follower.process_once()
    assert _rows(dst, "log") == [(1, "a"), (2, "b"), (3, "c")]


def test_follower_applies_deletes_downstream(spark, caches):
    """apply_deletes makes the hop a full CDC applier: source deletes
    remove the same keys from the destination."""
    src, dst = caches
    t = src.table_name("raw")
    follower = ChangeFeedFollower(
        src, "raw", dst, "clean", primary_keys=["id"], apply_deletes=True
    )
    src.store.write_merge(_df(spark, [(i, "a") for i in range(10)]), t, ["id"])
    res = follower.process_once()
    assert res["rows"] == 10 and res["deleted"] == 0
    # delete upstream, follow downstream
    src.store.delete_where(t, [("id", ">=", 7)])
    res = follower.process_once()
    assert res["deleted"] == 3
    assert _rows(dst, "clean") == [(i, "a") for i in range(7)]
    # replay safety: deleting absent keys is a no-op
    assert follower.process_once()["deleted"] == 0


def test_follower_delete_and_upsert_same_window(spark, caches):
    src, dst = caches
    t = src.table_name("raw")
    follower = ChangeFeedFollower(
        src, "raw", dst, "clean", primary_keys=["id"], apply_deletes=True
    )
    src.store.write_merge(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t, ["id"])
    follower.process_once()
    src.store.delete_where(t, [("id", "=", 2)])
    src.store.write_merge(_df(spark, [(1, "a2")], "z"), t, ["id"])
    res = follower.process_once()
    assert res["deleted"] == 1
    assert _rows(dst, "clean") == [(1, "a2"), (3, "c")]


def test_follower_delete_then_reinsert_same_window_survives(spark, caches):
    """Regression: a key deleted at version v then RE-INSERTED at a
    later version inside the same change window must survive
    downstream — only keys whose final change is a delete are
    deleted."""
    src, dst = caches
    t = src.table_name("raw")
    follower = ChangeFeedFollower(
        src, "raw", dst, "clean", primary_keys=["id"], apply_deletes=True
    )
    src.store.write_merge(_df(spark, [(1, "a"), (2, "b")]), t, ["id"])
    follower.process_once()
    # one window containing: delete(1) THEN re-insert(1)
    src.store.delete_where(t, [("id", "=", 1)])
    src.store.write_merge(_df(spark, [(1, "a2")], "z"), t, ["id"])
    res = follower.process_once()
    assert res["deleted"] == 0
    assert _rows(dst, "clean") == [(1, "a2"), (2, "b")]
    # destination mirrors the source snapshot
    assert _rows(src, "raw") == _rows(dst, "clean")


def test_follower_replace_commit_in_window_keeps_inserts(spark, caches):
    """A replace commit emits delete+insert for the same key at ONE
    version — the insert must win (strict version comparison)."""
    src, dst = caches
    t = src.table_name("raw")
    follower = ChangeFeedFollower(
        src, "raw", dst, "clean", primary_keys=["id"], apply_deletes=True
    )
    src.store.write_merge(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t, ["id"])
    follower.process_once()
    # replace drops key 3 and rewrites 1, 2 — all in one commit
    src.store.write_replace(_df(spark, [(1, "A"), (2, "B")], "z"), t)
    res = follower.process_once()
    assert _rows(dst, "clean") == [(1, "A"), (2, "B")]
    assert res["deleted"] >= 1  # key 3's final change is the delete
    assert _rows(src, "raw") == _rows(dst, "clean")


def test_follower_apply_deletes_requires_pks(spark, caches):
    src, dst = caches
    import pytest as _pytest

    with _pytest.raises(ValueError, match="requires primary_keys"):
        ChangeFeedFollower(src, "raw", dst, "clean", apply_deletes=True)


@pytest.mark.slow
def test_follower_dml_heavy_history_with_restore_boundaries(spark, caches):
    """~90-commit seeded churn — merges, predicate deletes, updates,
    and mid-history RESTOREs — with the follower checkpointing at
    irregular intervals. After EVERY checkpoint the destination must
    equal the source snapshot exactly (restore emits a same-version
    delete+insert swap; the final-change-wins delete ordering must let
    the restored rows' inserts beat the swap's deletes). At least one
    follower window must straddle a restore commit."""
    import random

    src, dst = caches
    t = src.table_name("raw")
    follower = ChangeFeedFollower(
        src, "raw", dst, "clean", primary_keys=["id"], apply_deletes=True
    )
    rng = random.Random(42)
    store = src.store

    def src_rows():
        df = store.read(t)
        return sorted((r["id"], r["v"]) for r in df.select("id", "v").collect())

    store.write_merge(
        _df(spark, [(i, f"init{i}") for i in range(1, 6)]), t, ["id"]
    )
    restore_versions = []
    n_commits = 1
    for i in range(90):
        roll = rng.random()
        if roll < 0.60:
            rows = [
                (rng.randint(1, 30), f"v{i}_{j}")
                for j in range(rng.randint(1, 3))
            ]
            # distinct ids within one merge batch
            rows = list({r[0]: r for r in rows}.values())
            store.write_merge(_df(spark, rows, f"m{i}"), t, ["id"])
        elif roll < 0.75:
            store.delete_where(t, [("id", "=", rng.randint(1, 30))])
        elif roll < 0.85:
            store.update_where(
                t, [("id", "=", rng.randint(1, 30))], {"v": f"'u{i}'"}
            )
        else:
            cur = store.latest_version(t)
            if cur >= 3:
                target = rng.randint(max(1, cur - 8), cur - 1)
                store.restore(t, target)
                restore_versions.append(store.latest_version(t))
        n_commits = store.latest_version(t)
        if rng.random() < 0.15:
            res = follower.process_once()
            assert res["to_version"] == n_commits
            assert _rows(dst, "clean") == src_rows(), (
                f"diverged at version {n_commits} (i={i})"
            )
    final = follower.process_once()
    assert final["to_version"] == store.latest_version(t)
    assert _rows(dst, "clean") == src_rows()
    # the churn mix must actually have exercised restore boundaries
    assert len(restore_versions) >= 2, restore_versions


def test_follower_across_rename_boundary(spark, caches):
    """A source column rename mid-history: change frames are emitted
    through the logical view AS OF each commit, so a window straddling
    the rename carries BOTH names (nulls where absent). The runbook is:
    apply the same rename downstream, give the follower a transform
    that coalesces old->new for straddling windows — then the
    destination converges to the renamed source snapshot."""
    src, dst = caches
    t = src.table_name("raw")

    def coalesce_names(changes):
        cols = changes.columns
        if "v" in cols and "val" in cols:
            changes = changes.withColumn(
                "val", F.coalesce("val", "v")
            ).drop("v")
        elif "v" in cols:
            changes = changes.withColumnRenamed("v", "val")
        # keep the feed columns: the follower routes deletes and
        # reduces to final-per-key state after the transform
        return changes

    follower = ChangeFeedFollower(
        src, "raw", dst, "clean",
        primary_keys=["id"], apply_deletes=True, transform=coalesce_names,
    )
    store = src.store
    store.write_merge(_df(spark, [(1, "a"), (2, "b")]), t, ["id"])
    follower.process_once()
    # the transform pins the destination schema to the FINAL name from
    # the first window on, so no downstream DDL is ever needed

    # window straddling the rename: one pre-rename commit (emits "v"),
    # the rename itself (no row changes), one post-rename (emits "val")
    store.write_merge(_df(spark, [(3, "c")]), t, ["id"])
    store.rename_column(t, "v", "val")
    renamed = spark.createDataFrame([(2, "b2"), (4, "d")], ["id", "val"])
    renamed = renamed.withColumn(
        "_airbyte_raw_id", F.concat(F.lit("n"), F.col("id").cast("string"))
    ).withColumn("_airbyte_extracted_at", F.current_timestamp())
    store.write_merge(renamed, t, ["id"])
    follower.process_once()

    def rows(cache, stream):
        df = cache.store.read(cache.table_name(stream))
        return sorted(
            (r["id"], r["val"]) for r in df.select("id", "val").collect()
        )

    assert rows(dst, "clean") == rows(src, "raw") == [
        (1, "a"), (2, "b2"), (3, "c"), (4, "d")
    ]

    # replay from scratch (fresh destination): the whole history incl.
    # the pre-rename windows converges under the same transform
    dst2 = SparkCache(
        spark,
        warehouse_dir=str(dst.warehouse_dir) + "_replay",
        table_format="commitlog",
    )
    replayer = ChangeFeedFollower(
        src, "raw", dst2, "clean",
        primary_keys=["id"], apply_deletes=True, transform=coalesce_names,
    )
    replayer.process_once()
    assert rows(dst2, "clean") == rows(src, "raw")


def test_follower_bounded_catchup_windows(spark, caches):
    """max_versions_per_cycle caps each window so a follower resuming
    after a long outage never diffs the whole backlog in one plan;
    run(stop_when_caught_up=True) drains the backlog in bounded steps
    and every intermediate destination state is a consistent AS-OF
    snapshot of the source."""
    src, dst = caches
    t = src.table_name("raw")
    store = src.store
    for i in range(10):
        store.write_merge(_df(spark, [(i % 4, f"v{i}"), (10 + i, f"w{i}")], f"b{i}"), t, ["id"])
    store.set_check(t, "id_nonneg", "id >= 0")  # metadata-only commit
    store.write_merge(_df(spark, [(99, "tail")]), t, ["id"])
    latest = store.latest_version(t)
    assert latest == 12

    follower = ChangeFeedFollower(
        src, "raw", dst, "clean",
        primary_keys=["id"], apply_deletes=True, max_versions_per_cycle=3,
    )
    results = follower.run(poll_interval=0.0, stop_when_caught_up=True)
    bounded = [r for r in results if r["to_version"] > r["from_version"]]
    assert all(r["to_version"] - r["from_version"] <= 3 for r in bounded)
    assert bounded[-1]["to_version"] == latest
    # each bounded window ends on a real snapshot boundary
    assert [r["to_version"] for r in bounded] == [3, 6, 9, 12]
    src_rows = sorted(
        (r["id"], r["v"])
        for r in store.read(t).select("id", "v").collect()
    )
    assert _rows(dst, "clean") == src_rows


# -- snapshot-diff catch-up path ---------------------------------------------


def test_diff_snapshots_classification(spark, caches):
    """One change per key: insert / update_postimage / delete, with
    bookkeeping-only rewrites digest-suppressed and intermediate
    states invisible."""
    src, _ = caches
    t = src.table_name("raw")
    store = src.store
    store.write_merge(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t, ["id"])
    v_from = store.latest_version(t)
    store.write_merge(_df(spark, [(1, "a2"), (4, "d")], "s"), t, ["id"])
    store.delete_where(t, [("id", "=", 2)])
    # bookkeeping-only rewrite: same user values, new raw id
    store.write_merge(_df(spark, [(3, "c")], "rewrite"), t, ["id"])
    # churn a key through intermediate states back to a NEW final value
    store.write_merge(_df(spark, [(1, "mid")], "m1"), t, ["id"])
    store.write_merge(_df(spark, [(1, "a3")], "m2"), t, ["id"])
    v_to = store.latest_version(t)

    diff = store.diff_snapshots(t, v_from, v_to, ["id"])
    got = sorted(
        (r["id"], r["_change_type"], r["v"], r["_commit_version"])
        for r in diff.collect()
    )
    assert got == [
        (1, "update_postimage", "a3", v_to),
        (2, "delete", "b", v_to),
        (4, "insert", "d", v_to),
    ]
    # from_version=0: the whole snapshot as inserts
    full = store.diff_snapshots(t, 0, v_to, ["id"])
    assert sorted(r["_change_type"] for r in full.collect()) == ["insert"] * 3


def test_diff_snapshots_falls_back_on_rename_in_window(spark, caches):
    src, _ = caches
    t = src.table_name("raw")
    store = src.store
    store.write_merge(_df(spark, [(1, "a")]), t, ["id"])
    v_from = store.latest_version(t)
    store.rename_column(t, "v", "val")
    v_to = store.latest_version(t)
    assert store.diff_snapshots(t, v_from, v_to, ["id"]) is None


def test_follower_snapshot_diff_equivalent_to_per_commit(spark, caches, tmp_path):
    """Both catch-up strategies must land the destination on the exact
    source snapshot across a DML-heavy window (merge, delete, update,
    restore)."""
    src, dst = caches
    t = src.table_name("raw")
    store = src.store
    store.write_merge(_df(spark, [(i, f"v{i}") for i in range(1, 8)]), t, ["id"])
    store.delete_where(t, [("id", "=", 3)])
    store.update_where(t, [("id", "=", 5)], {"v": "'u5'"})
    store.write_merge(_df(spark, [(2, "v2b"), (9, "new9")], "m"), t, ["id"])
    store.restore(t, 2)  # snapshot swap back past the update
    store.write_merge(_df(spark, [(1, "final1")], "f"), t, ["id"])

    fast = ChangeFeedFollower(
        src, "raw", dst, "clean", primary_keys=["id"], apply_deletes=True
    )
    fast.process_once()
    dst2 = SparkCache(
        spark, warehouse_dir=str(tmp_path / "dst2"), table_format="commitlog"
    )
    slow = ChangeFeedFollower(
        src, "raw", dst2, "clean",
        primary_keys=["id"], apply_deletes=True, snapshot_diff=False,
    )
    slow.process_once()
    src_rows = sorted(
        (r["id"], r["v"]) for r in store.read(t).select("id", "v").collect()
    )
    assert _rows(dst, "clean") == src_rows
    assert _rows(dst2, "clean") == src_rows


def test_follower_custom_transform_uses_per_commit_path(spark, caches, monkeypatch):
    """A custom transform sees per-commit granularity, so the snapshot
    collapse must NOT engage for it."""
    src, dst = caches
    t = src.table_name("raw")
    src.store.write_merge(_df(spark, [(1, "a")]), t, ["id"])
    calls = []
    orig = type(src.store).diff_snapshots

    def spy(self, *a, **k):
        calls.append(a)
        return orig(self, *a, **k)

    monkeypatch.setattr(type(src.store), "diff_snapshots", spy)
    follower = ChangeFeedFollower(
        src, "raw", dst, "clean",
        primary_keys=["id"], transform=lambda df: df,
    )
    follower.process_once()
    assert not calls
    assert _rows(dst, "clean") == [(1, "a")]


# -- round 10: cross-table snapshot consistency -----------------------------


def test_consistent_snapshot_pins_untorn_chain(spark, tmp_path):
    """raw → clean → enr chain, updated MID-pipeline (clean advanced,
    enr not): the naive latest-latest join is torn; the version-vector
    pin reads both tables as of the same upstream snapshot."""
    cache = SparkCache(
        spark, warehouse_dir=str(tmp_path / "w"), table_format="commitlog"
    )
    t_raw = cache.table_name("raw")
    f1 = ChangeFeedFollower(
        cache, "raw", cache, "clean", primary_keys=["id"],
        follower_name="h1",
    )
    f2 = ChangeFeedFollower(
        cache, "clean", cache, "enr", primary_keys=["id"],
        follower_name="h2",
        transform=lambda df: df.withColumn(
            "v", F.concat(F.col("v"), F.lit("!"))
        ),
    )
    cache.store.write_merge(_df(spark, [(1, "a"), (2, "b")]), t_raw, ["id"])
    f1.process_once()
    f2.process_once()
    # provenance rode the dest commits atomically
    assert f1.source_version_at() == 1
    assert f2.source_version_at() >= 1

    # MID-UPDATE: raw and clean advance, enr does NOT
    cache.store.write_merge(
        _df(spark, [(3, "c"), (1, "a2")], "s"), t_raw, ["id"]
    )
    f1.process_once()
    naive = {
        r["id"]
        for r in cache["clean"].to_spark().select("id").collect()
    }
    assert naive == {1, 2, 3}, "clean is ahead — naive join would tear"
    assert {
        r["id"] for r in cache["enr"].to_spark().select("id").collect()
    } == {1, 2}

    versions, snap = ChangeFeedFollower.consistent_snapshot([f1, f2])
    assert snap is not None
    clean_pin = snap.read(cache.table_name("clean"))
    enr_pin = snap.read(cache.table_name("enr"))
    c = {(r["id"], r["v"]) for r in clean_pin.select("id", "v").collect()}
    e = {(r["id"], r["v"]) for r in enr_pin.select("id", "v").collect()}
    # both reflect EXACTLY raw@1: same keys, enr = transform(clean)
    assert c == {(1, "a"), (2, "b")}
    assert e == {(1, "a!"), (2, "b!")}
    assert versions["raw"] == 1

    # after the lagging hop catches up, the pin advances with it
    f2.process_once()
    versions2, snap2 = ChangeFeedFollower.consistent_snapshot([f1, f2])
    assert versions2["raw"] == 2
    e2 = {
        (r["id"], r["v"])
        for r in snap2.read(cache.table_name("enr"))
        .select("id", "v")
        .collect()
    }
    assert e2 == {(1, "a2!"), (2, "b!"), (3, "c!")}


def test_follower_txn_makes_replay_exactly_once(spark, caches):
    """A crash between the dest data commit and the cursor commit
    replays the window — the SetTransaction watermark (which rode the
    data commit atomically) skips it instead of re-merging."""
    src, dst = caches
    t = src.table_name("raw")
    f = ChangeFeedFollower(src, "raw", dst, "clean", primary_keys=["id"])
    src.store.write_merge(_df(spark, [(1, "a"), (2, "b")]), t, ["id"])
    f.process_once()
    dest_table = dst.table_name("clean")
    v_after = dst.store.latest_version(dest_table)
    # simulate the crash: reset the cursor as if it never committed
    f._commit_cursor(0)
    res = f.process_once()  # replays window (0, 1]
    assert res["rows"] == 2  # the window was reprocessed...
    assert dst.store.latest_version(dest_table) == v_after, (
        "...but the dest write was SKIPPED by the txn watermark — "
        "no new commit"
    )
    assert _rows(dst, "clean") == [(1, "a"), (2, "b")]


def test_store_snapshot_explicit_versions(spark, tmp_path):
    """store.snapshot pins arbitrary version vectors and validates."""
    from pyairbyte_spark.writers import CommitLogTableStore

    store = CommitLogTableStore(spark, str(tmp_path / "s"), "main")
    store.write_append(spark.range(0, 5).coalesce(1), "a")
    store.write_append(spark.range(5, 9).coalesce(1), "a")
    store.write_append(spark.range(0, 3).coalesce(1), "b")
    snap = store.snapshot(["a", "b"])
    store.write_append(spark.range(100, 200).coalesce(1), "a")
    assert snap.read("a").count() == 9, "writers after the pin invisible"
    assert snap.read("b").count() == 3
    pinned = store.snapshot({"a": 1})
    assert pinned.read("a").count() == 5
    with pytest.raises(KeyError):
        snap.read("zzz")
    with pytest.raises(FileNotFoundError):
        store.snapshot({"a": 99})


def test_cache_snapshot_streams_untorn_join_mid_update(spark, tmp_path):
    """VERDICT r10 #6: the cache-layer pin. Two follower-maintained
    streams joined MID-UPDATE (clean advanced past agg): the chain pin
    derives the torn-free vector from the provenance watermarks alone
    — no follower objects in hand — and the clean ⋈ agg join reflects
    exactly one upstream snapshot. The tools/MCP surface wraps this."""
    from pyairbyte_spark import tools

    cache = SparkCache(
        spark, warehouse_dir=str(tmp_path / "w"), table_format="commitlog"
    )
    t_raw = cache.table_name("raw")
    f1 = ChangeFeedFollower(cache, "raw", cache, "clean", primary_keys=["id"])
    f2 = ChangeFeedFollower(
        cache, "clean", cache, "agg", primary_keys=["id"],
        transform=lambda df: df.withColumn("v", F.upper("v")),
    )
    cache.store.write_merge(_df(spark, [(1, "a"), (2, "b")]), t_raw, ["id"])
    f1.process_once()
    f2.process_once()
    # mid-update: raw+clean advance, agg lags
    cache.store.write_merge(_df(spark, [(3, "c")], "s"), t_raw, ["id"])
    f1.process_once()
    assert cache["clean"].to_spark().count() == 3  # naive view is torn
    assert cache["agg"].to_spark().count() == 2

    snap = cache.snapshot_streams(chain=[("raw", "clean"), ("clean", "agg")])
    joined = (
        snap.read("clean")
        .alias("c")
        .join(snap.read("agg").alias("g"), "id")
        .select("id", F.col("c.v").alias("cv"), F.col("g.v").alias("gv"))
    )
    rows = {(r["id"], r["cv"], r["gv"]) for r in joined.collect()}
    # every clean row has its agg counterpart: ONE upstream snapshot
    assert rows == {(1, "a", "A"), (2, "b", "B")}
    assert snap.read("clean").count() == snap.read("agg").count() == 2
    assert snap.versions["raw"] == 1

    # concurrent writers stay invisible to the held pin
    cache.store.write_merge(_df(spark, [(9, "z")], "z"), t_raw, ["id"])
    f1.process_once()
    assert snap.read("clean").count() == 2

    # tools/MCP surface: same vector + pinned counts
    out = tools.get_consistent_snapshot(
        cache, chain=[["raw", "clean"], ["clean", "agg"]]
    )
    assert out["rows"]["clean"] == out["rows"]["agg"]
    assert set(out["versions"]) == {"raw", "clean", "agg"}

    # list mode pins independent streams at capture
    out2 = cache.snapshot_streams(["clean", "agg"])
    assert set(out2.versions) == {"clean", "agg"}
    # explicit-vector mode round-trips a saved pin
    replay = cache.snapshot_streams(dict(snap.versions))
    assert replay.read("agg").count() == 2
    # arg validation
    with pytest.raises(ValueError, match="exactly one"):
        cache.snapshot_streams(["a"], chain=[("a", "b")])
    with pytest.raises(ValueError, match="chain break"):
        cache.snapshot_streams(chain=[("raw", "clean"), ("aggX", "y")])
    with pytest.raises(ValueError, match="no recorded provenance"):
        cache.snapshot_streams(chain=[("raw", "clean")], follower_name="nope")


def test_follower_window_materializes_once(spark, caches):
    """r14 job-count guard: one process_once window runs its diff/CDF
    scan ONCE. Without the two lazy localCheckpoints in process_once,
    the window plan re-executes for each consumer — the row count, the
    destination merge (which also re-reads the source frame for
    touched-bucket discovery) and the delete scan — 20 jobs for this
    window vs 13 with single materialization. Job accounting via job
    groups, as in test_append_epoch_costs_one_write_job."""
    src, dst = caches
    t = src.table_name("raw")
    follower = ChangeFeedFollower(
        src, "raw", dst, "clean", primary_keys=["id"], apply_deletes=True
    )
    src.store.write_merge(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t, ["id"])
    follower.process_once()  # seed destination + cursor
    # window: update + insert in one commit, a delete in the next
    src.store.write_merge(_df(spark, [(1, "a2"), (4, "d")], "s"), t, ["id"])
    src.store.delete_where(t, [("id", "=", 2)])
    sc = spark.sparkContext
    sc.setJobGroup("feed-window-guard", "job-count guard")
    res = follower.process_once()
    sc.setJobGroup("post", "job-count guard")
    assert res["rows"] == 2 and res["deleted"] == 1
    assert _rows(dst, "clean") == [(1, "a2"), (3, "c"), (4, "d")]
    jobs = sc.statusTracker().getJobIdsForGroup("feed-window-guard")
    # Measured breakdown (pinned): diff materialization + count (2),
    # out-checkpoint consumers reading blocks, the destination merge's
    # staged writes, the delete-key collect and the downstream delete,
    # cursor commit metadata. Re-running the window plan per consumer
    # adds ~7 jobs and fails here.
    assert len(jobs) <= 14, f"window ran {len(jobs)} jobs: {sorted(jobs)}"
