"""Branches & tags (named refs) over the commit log — write-audit-
publish (WAP) for the table store.

A BRANCH is a named fork: its commits claim slots from the same
per-table version sequence but carry a ``branch`` + incarnation-id
stamp that keeps them permanently invisible on main (and on every
other ref); ``publish_branch`` fast-forwards main with ONE ordinary
commit. A TAG pins a readable version under an immutable name. Both
refs hold vacuum's retention floor while they live.

Reference point: the reference stages each stream in a temp table and
swaps it in per-table (``airbyte/shared/sql_processor.py:1061-1087``)
— per-table WAP with no audit step and no cross-writer isolation;
this layer adds the audit window, exact CDF across the publish, and
multi-writer interleaving on one log.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.writers import (
    CommitLogTableStore,
    ConcurrentCommitError,
)


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path / "wh"), "main")


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string").coalesce(1)


def _vals(df):
    return sorted((r["id"], r["v"]) for r in df.select("id", "v").collect())


# -- branch isolation ---------------------------------------------------------


def test_branch_writes_invisible_on_main(spark, store):
    store.write_append(_df(spark, [(1, "a"), (2, "b")]), "t", ["id"])
    store.create_branch("t", "audit")
    bv = store.branch("audit")
    bv.write_append(_df(spark, [(3, "c")]), "t", ["id"])
    bv.merge_into(
        "t",
        _df(spark, [(2, "B")]),
        ["id"],
        when_matched_update={"v": "s.v"},
    )
    assert _vals(store.read("t")) == [(1, "a"), (2, "b")]
    assert _vals(bv.read("t")) == [(1, "a"), (2, "B"), (3, "c")]


def test_branch_without_commits_reads_fork_base(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    store.create_branch("t", "audit")
    # main advances AFTER the fork: the branch must not see it
    store.write_append(_df(spark, [(2, "b")]), "t", ["id"])
    bv = store.branch("audit")
    assert _vals(bv.read("t")) == [(1, "a")]
    assert store.branch_head("t", "audit") == 1


def test_main_cannot_time_travel_into_branch(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    store.create_branch("t", "audit")
    bv = store.branch("audit")
    bv.write_append(_df(spark, [(2, "b")]), "t", ["id"])
    v = store.branch_head("t", "audit")
    with pytest.raises(ValueError, match="belongs to branch"):
        store.read_version("t", v)
    # ...but the branch view reads main history below its fork point
    assert _vals(bv.read_version("t", 1)) == [(1, "a")]


def test_ref_name_validation_and_exclusive_create(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    with pytest.raises(ValueError, match="invalid ref name"):
        store.create_branch("t", "main")
    with pytest.raises(ValueError, match="invalid ref name"):
        store.create_branch("t", "a/b")
    store.create_branch("t", "x")
    with pytest.raises(ValueError, match="already exists"):
        store.create_branch("t", "x")
    with pytest.raises(ValueError, match="already exists"):
        store.create_tag("t", "x")


# -- publish (the WAP flip) ---------------------------------------------------


def test_publish_fast_forwards_main_atomically(spark, store):
    store.write_append(_df(spark, [(1, "a"), (4, "d")]), "t", ["id"])
    store.create_branch("t", "audit")
    bv = store.branch("audit")
    bv.write_append(_df(spark, [(3, "c")]), "t", ["id"])
    bv.merge_into(
        "t",
        _df(spark, [(1, "A")]),
        ["id"],
        when_matched_update={"v": "s.v"},
    )
    bv.delete_where("t", [[("id", "=", 4)]], mode="mor")
    v = store.publish_branch("t", "audit")
    assert store.latest_version("t") == v
    assert _vals(store.read("t")) == [(1, "A"), (3, "c")]
    # ref dropped by default after publish
    assert "audit" not in store.refs("t")


def test_publish_cdf_is_exact_endpoint_diff(spark, store):
    store.write_append(_df(spark, [(1, "a"), (2, "b"), (4, "d")]), "t", ["id"])
    store.create_branch("t", "audit")
    bv = store.branch("audit")
    bv.write_append(_df(spark, [(3, "c")]), "t", ["id"])
    bv.merge_into(
        "t",
        _df(spark, [(2, "B")]),
        ["id"],
        when_matched_update={"v": "s.v"},
    )
    bv.delete_where("t", [[("id", "=", 4)]], mode="mor")
    v = store.publish_branch("t", "audit")
    ch = store.read_changes("t", 1, v)
    got = sorted(
        (r["id"], r["v"], r["_change_type"])
        for r in ch.select("id", "v", "_change_type").collect()
    )
    # NET changes only — audit-rejected intermediates never leak, and
    # the branch's three commits collapse into one classified diff.
    assert got == [
        (2, "B", "update_postimage"),
        (3, "c", "insert"),
        (4, "d", "delete"),
    ]
    assert all(
        r["_commit_version"] == v
        for r in ch.select("_commit_version").collect()
    )


def test_publish_refuses_diverged_main(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    store.create_branch("t", "audit")
    bv = store.branch("audit")
    bv.write_append(_df(spark, [(2, "b")]), "t", ["id"])
    store.write_append(_df(spark, [(9, "z")]), "t", ["id"])  # main moves
    with pytest.raises(ConcurrentCommitError, match="fast-forward"):
        store.publish_branch("t", "audit")
    # nothing published, branch still live for re-audit bookkeeping
    assert _vals(store.read("t")) == [(1, "a"), (9, "z")]
    assert "audit" in store.refs("t")


def test_publish_empty_branch_is_noop(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    store.create_branch("t", "audit")
    assert store.publish_branch("t", "audit") == 1
    assert "audit" not in store.refs("t")


# -- interleaving on one log --------------------------------------------------


def test_main_and_branch_writers_interleave(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    store.create_branch("t", "audit")
    bv = store.branch("audit")
    # alternate refs: each writer slides past the other's slots
    bv.write_append(_df(spark, [(10, "b0")]), "t", ["id"])
    store.write_append(_df(spark, [(20, "m0")]), "t", ["id"])
    bv.write_append(_df(spark, [(11, "b1")]), "t", ["id"])
    store.write_append(_df(spark, [(21, "m1")]), "t", ["id"])
    assert _vals(store.read("t")) == [(1, "a"), (20, "m0"), (21, "m1")]
    assert _vals(bv.read("t")) == [(1, "a"), (10, "b0"), (11, "b1")]


def test_concurrent_main_and_branch_appends_thread(spark, store):
    store.write_append(_df(spark, [(0, "seed")]), "t", ["id"])
    store.create_branch("t", "audit")
    bv = store.branch("audit")
    errs = []

    def run(view, lo, pre):
        try:
            for i in range(3):
                view.write_append(
                    _df(spark, [(lo + i, f"{pre}{i}")]), "t", ["id"]
                )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [
        threading.Thread(target=run, args=(store, 100, "m")),
        threading.Thread(target=run, args=(bv, 200, "b")),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert errs == []
    main_ids = [i for i, _ in _vals(store.read("t"))]
    branch_ids = [i for i, _ in _vals(bv.read("t"))]
    assert main_ids == [0, 100, 101, 102]
    assert branch_ids == [0, 200, 201, 202]


# -- drop / recreate safety ---------------------------------------------------


def test_dropped_branch_commits_never_resurrect(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    store.create_branch("t", "x")
    old = store.branch("x")
    old.write_append(_df(spark, [(9, "dead")]), "t", ["id"])
    store.drop_branch("t", "x")
    store.create_branch("t", "x")  # same name, new incarnation
    fresh = store.branch("x")
    assert _vals(fresh.read("t")) == [(1, "a")]
    # the pinned old view keeps ITS incarnation (no cross-talk)
    assert (9, "dead") in _vals(old.read("t"))


def test_txn_groups_are_main_only(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    store.create_branch("t", "audit")
    bv = store.branch("audit")
    with pytest.raises(ValueError, match="main-ref only"):
        bv.begin_txn()
    with pytest.raises(ValueError, match="main-ref only"):
        bv.write_append(
            _df(spark, [(2, "b")]), "t", ["id"], txn_group="g-1"
        )


# -- tags ---------------------------------------------------------------------


def test_tag_pins_and_survives_later_writes(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    store.create_tag("t", "rel1")
    store.write_append(_df(spark, [(2, "b")]), "t", ["id"])
    assert _vals(store.read_tag("t", "rel1")) == [(1, "a")]
    store.drop_tag("t", "rel1")
    assert store.refs("t") == {}
    with pytest.raises(FileNotFoundError):
        store.read_tag("t", "rel1")


def test_tag_and_branch_namespaces_are_type_checked(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    store.create_tag("t", "rel1")
    store.create_branch("t", "dev")
    with pytest.raises(ValueError, match="is a tag"):
        store.branch("rel1").read("t")
    with pytest.raises(ValueError, match="is a branch"):
        store.read_tag("t", "dev")
    with pytest.raises(ValueError, match="is a tag"):
        store.drop_branch("t", "rel1")
    with pytest.raises(ValueError, match="is a branch"):
        store.drop_tag("t", "dev")


# -- retention ----------------------------------------------------------------


def test_vacuum_respects_ref_retention_floor(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    store.create_tag("t", "rel1")  # pins version 1
    for i in range(2, 6):
        store.write_replace(_df(spark, [(i, f"v{i}")]), "t", ["id"])
    store.vacuum("t", keep_commits=1)
    # the tag held the whole window: version 1 still reads
    assert _vals(store.read_tag("t", "rel1")) == [(1, "a")]
    store.drop_tag("t", "rel1")
    store.vacuum("t", keep_commits=1)
    with pytest.raises((FileNotFoundError, Exception)):
        _vals(store.read_version("t", 1))


def test_vacuum_keeps_live_branch_fallback(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    store.create_branch("t", "slow")  # fork base = 1
    for i in range(2, 6):
        store.write_replace(_df(spark, [(i, f"v{i}")]), "t", ["id"])
    store.vacuum("t", keep_commits=1)
    # the branch's fallback read (no branch commits) is its fork base
    assert _vals(store.branch("slow").read("t")) == [(1, "a")]


# -- history + timestamp travel ----------------------------------------------


def test_history_annotates_branch_commits(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    store.create_branch("t", "audit")
    bv = store.branch("audit")
    bv.write_append(_df(spark, [(2, "b")]), "t", ["id"])
    store.publish_branch("t", "audit")
    hist = {h["version"]: h for h in store.history("t")}
    assert hist[2]["branch"] == "audit"
    assert hist[3]["op"] == "publish_branch"
    assert hist[3]["published_branch"] == "audit"
    assert "branch" not in hist[3]


def test_timestamp_travel_skips_other_refs(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    store.create_branch("t", "audit")
    store.branch("audit").write_append(_df(spark, [(2, "b")]), "t", ["id"])
    # main's TIMESTAMP AS OF must resolve to version 1, not the newer
    # branch commit
    v = store.version_at_timestamp("t", 2**31)
    assert v == 1


def test_branch_change_feed_sees_only_branch_commits(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    store.create_branch("t", "audit")
    bv = store.branch("audit")
    bv.write_append(_df(spark, [(2, "b")]), "t", ["id"])
    store.write_append(_df(spark, [(9, "m")]), "t", ["id"])
    bch = bv.read_changes("t", 1)
    assert sorted(
        (r["id"], r["_change_type"])
        for r in bch.select("id", "_change_type").collect()
    ) == [(2, "insert")]


# -- cache + MCP surface -------------------------------------------------------


def test_cache_and_tools_branch_surface(spark, tmp_path):
    from pyairbyte_spark import tools
    from pyairbyte_spark.cache import SparkCache

    cache = SparkCache(
        spark, str(tmp_path / "bwh"), table_format="commitlog"
    )
    cache.write_dataframe(_df(spark, [(1, "a"), (2, "b")]), "docs")
    tools.create_table_branch(cache, "docs", "audit")
    bw = cache.branch_stream_writer("audit")
    bw.write_append(
        _df(spark, [(3, "c")]), cache.table_name("docs"), ["id"]
    )
    # candidate visible on the branch read, not on main
    assert _vals(cache.read_stream_branch("docs", "audit")) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]
    assert len(cache["docs"]) == 2
    refs = tools.list_table_refs(cache, "docs")
    assert refs["audit"]["type"] == "branch"
    out = tools.publish_table_branch(cache, "docs", "audit")
    assert out["published_version"] > 1
    assert len(cache["docs"]) == 3
    # tags via the cache layer
    cache.create_stream_tag("docs", "rel1")
    assert cache.read_stream_tag("docs", "rel1").count() == 3
    cache.drop_stream_tag("docs", "rel1")
    # drop an abandoned branch through the tool
    tools.create_table_branch(cache, "docs", "scrap")
    assert tools.drop_table_branch(cache, "docs", "scrap") == {
        "dropped": "scrap"
    }
    assert tools.list_table_refs(cache, "docs") == {}


def test_streaming_wap_exactly_once_onto_branch(spark, store, tmp_path):
    """WAP for streams: a Structured Streaming query lands micro-
    batches on a branch exactly-once (branch views carry the full
    SetTransaction contract), main serves the audited state throughout,
    and the publish carries the txn watermark so a replayed epoch
    stays a no-op AFTER the flip too."""
    from pyairbyte_spark.streaming.sink import StoreStreamingSink

    store.write_append(_df(spark, [(0, "base")]), "t", ["id"])
    store.create_branch("t", "ingest")
    bv = store.branch("ingest")
    src = tmp_path / "src"
    src.mkdir()
    spark.range(1, 51).toDF("id").withColumn(
        "v", F.col("id").cast("string")
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b0"))
    sink = StoreStreamingSink(bv, "t", "pipe")
    stream = spark.readStream.schema("id long, v string").parquet(
        str(src) + "/*"
    )
    q = sink.attach(
        stream, checkpoint_dir=str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)
    assert bv.read("t").count() == 51
    assert store.read("t").count() == 1  # main untouched mid-stream
    last = bv.txn_version("t", "pipe")
    v = store.publish_branch("t", "ingest")
    assert store.read("t").count() == 51
    # the watermark rode the publish: a post-publish replay of the last
    # epoch against a RE-FORKED branch is still a no-op
    store.create_branch("t", "ingest")
    bv2 = store.branch("ingest")
    sink2 = StoreStreamingSink(bv2, "t", "pipe")
    sink2(
        spark.range(1, 51).toDF("id").withColumn(
            "v", F.col("id").cast("string")
        ),
        last,
    )
    assert sink2.skipped_epochs == 1
    assert bv2.read("t").count() == 51
    assert store.latest_version("t") == v


# -- rebase-appends publish ----------------------------------------------------


def test_publish_rebase_appends_onto_advanced_main(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    store.create_branch("t", "ingest")
    bv = store.branch("ingest")
    bv.write_append(_df(spark, [(10, "b0")]), "t", ["id"])
    bv.write_append(_df(spark, [(11, "b1")]), "t", ["id"])
    # main moves past the fork — a merge, even
    store.merge_into(
        "t",
        _df(spark, [(1, "A"), (2, "m")]),
        ["id"],
        when_matched_update={"v": "s.v"},
    )
    v = store.publish_branch("t", "ingest", mode="rebase-appends")
    # serial-order equivalence: main's merge, THEN the branch appends
    assert _vals(store.read("t")) == [
        (1, "A"),
        (2, "m"),
        (10, "b0"),
        (11, "b1"),
    ]
    ch = store.read_changes("t", v - 1, v)
    assert sorted(
        (r["id"], r["_change_type"])
        for r in ch.select("id", "_change_type").collect()
    ) == [(10, "insert"), (11, "insert")]


def test_rebase_refuses_non_append_branch(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    store.create_branch("t", "mix")
    bv = store.branch("mix")
    bv.write_append(_df(spark, [(2, "b")]), "t", ["id"])
    bv.merge_into(
        "t",
        _df(spark, [(1, "A")]),
        ["id"],
        when_matched_update={"v": "s.v"},
    )
    store.write_append(_df(spark, [(9, "m")]), "t", ["id"])
    with pytest.raises(ConcurrentCommitError, match="only blind appends"):
        store.publish_branch("t", "mix", mode="rebase-appends")


def test_rebase_refuses_concurrent_rebucket(spark, store):
    big = _df(spark, [(i, f"v{i}") for i in range(20)]).withColumn(
        "_airbyte_raw_id", F.concat(F.lit("r"), F.col("id"))
    ).withColumn(
        "_airbyte_extracted_at", F.lit("2024-01-01").cast("timestamp")
    )
    store2 = CommitLogTableStore(
        store.spark, store.root, "main", merge_buckets=8
    )
    store2.write_merge(big, "t", ["id"])
    store2.create_branch("t", "ingest")
    bv = store2.branch("ingest")
    bv.write_append(_df(spark, [(100, "x")]), "t", ["id"])
    store2.rebucket_table("t", 2)
    with pytest.raises(ConcurrentCommitError, match="rebucketed"):
        store2.publish_branch("t", "ingest", mode="rebase-appends")


def test_rebase_merges_txn_watermarks(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    store.create_branch("t", "ingest")
    bv = store.branch("ingest")
    bv.write_append(_df(spark, [(2, "b")]), "t", ["id"], txn=("pipe", 7))
    store.write_append(_df(spark, [(9, "m")]), "t", ["id"], txn=("other", 3))
    store.publish_branch("t", "ingest", mode="rebase-appends")
    assert store.txn_version("t", "pipe") == 7
    assert store.txn_version("t", "other") == 3
    # post-publish replay of the branch epoch is a no-op on MAIN now
    r = store.write_append(_df(spark, [(2, "b")]), "t", ["id"], txn=("pipe", 7))
    assert r["skipped"] is True
    assert store.read("t").count() == 3


def test_maintenance_plan_flags_stale_refs(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    store.create_branch("t", "old-audit")
    store.create_tag("t", "old-rel")
    # fresh refs: quiet
    assert not any(
        r["action"] == "drop_ref" for r in store.maintenance_plan("t")
    )
    # aged refs: both flagged with their floor + the release verb
    recs = store.maintenance_plan("t", max_ref_age_hours=0.0)
    flagged = [r for r in recs if r["action"] == "drop_ref"]
    assert len(flagged) == 2
    reasons = " | ".join(r["reason"] for r in flagged)
    assert "publish_branch or drop_branch" in reasons
    assert "drop_tag" in reasons
    store.drop_branch("t", "old-audit")
    store.drop_tag("t", "old-rel")
    assert not any(
        r["action"] == "drop_ref"
        for r in store.maintenance_plan("t", max_ref_age_hours=0.0)
    )


# -- round-12 regression fixes -------------------------------------------------


def test_branch_change_feed_includes_prefork_main(spark, store):
    # the branch's logical history INCLUDES main's commits at or below
    # the fork base (same floor fallthrough the visibility walks use)
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    store.create_branch("t", "audit")
    bv = store.branch("audit")
    store.write_append(_df(spark, [(9, "m")]), "t", ["id"])  # post-fork main
    bv.write_append(_df(spark, [(2, "b")]), "t", ["id"])
    got = sorted(
        (r["id"], r["_change_type"])
        for r in bv.read_changes("t", 0).select("id", "_change_type").collect()
    )
    # pre-fork main insert + the branch's own insert; never the
    # post-fork main commit
    assert got == [(1, "insert"), (2, "insert")]


def test_branch_timestamp_travel_excludes_postfork_main(spark, store):
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    store.create_branch("t", "audit")
    bv = store.branch("audit")
    bv.write_append(_df(spark, [(2, "b")]), "t", ["id"])
    store.write_append(_df(spark, [(9, "m")]), "t", ["id"])  # newest commit
    # branch view: the newest snapshot on THIS ref is the branch tip,
    # not main's post-fork commit
    assert bv.version_at_timestamp("t", 2**31) == 2
    # main view unchanged: resolves to its own head, never the branch
    assert store.version_at_timestamp("t", 2**31) == 3


def test_publish_manifest_drops_stale_checkpoint_ref(spark, store, monkeypatch):
    from pyairbyte_spark import manifest as mf

    # force every commit FULL and every full manifest through the
    # parquet-checkpoint sidecar
    monkeypatch.setattr(mf, "PARQUET_CHECKPOINT_MIN_ENTRIES", 1)
    monkeypatch.setattr(mf, "CHECKPOINT_INTERVAL", 1)
    store.write_append(_df(spark, [(1, "a")]), "t", ["id"])
    store.create_branch("t", "audit")
    bv = store.branch("audit")
    bv.write_append(_df(spark, [(2, "b")]), "t", ["id"])
    tip_raw = store._read_commit_json("t", 2)
    assert tip_raw.get("entries_ref")  # the scenario: checkpointed tip
    v = store.publish_branch("t", "audit")
    pub_raw = store._read_commit_json("t", v)
    # the publish commit must NOT carry the branch tip's sidecar ref —
    # a stale entries_ref would override the publish's own entry list
    # on every raw read and pin the dead sidecar against vacuum
    assert pub_raw.get("entries_ref") != tip_raw.get("entries_ref")
    assert _vals(store.read("t")) == [(1, "a"), (2, "b")]


def test_publish_keys_ignore_dead_incarnation(spark, store):
    # merge_keys recorded by a DROPPED prior incarnation of the same
    # branch name must not leak into the publish commit's CDF pairing
    store.write_append(_df(spark, [(1, "a"), (2, "b")]), "t")  # no pks
    store.create_branch("t", "audit")
    bv1 = store.branch("audit")
    bv1.merge_into(
        "t",
        _df(spark, [(1, "A")]),
        ["id"],
        when_matched_update={"v": "s.v"},
    )
    store.drop_branch("t", "audit")
    store.create_branch("t", "audit")  # new incarnation, same name
    bv2 = store.branch("audit")
    bv2.write_append(_df(spark, [(3, "c")]), "t")
    v = store.publish_branch("t", "audit")
    pub = store._read_commit_json("t", v)
    assert "merge_keys" not in pub
    assert _vals(store.read("t")) == [(1, "a"), (2, "b"), (3, "c")]


def test_branch_view_pushdown_aggregates(spark, store):
    """Round-13 gate (r12 directive #7): the aggregate-pushdown family
    works through a BRANCH VIEW — WAP audits answer counts/min/max on
    the audit branch from manifests (zero files read), see fork-base
    files below the fork, never see main commits above it, and main's
    own pushdowns never see the branch until publish."""
    nums = spark.range(0, 1000).toDF("id").withColumn(
        "v", (F.col("id") * 7) % 100
    )
    store.write_append(nums.coalesce(4), "t")
    store.compact("t", sort_by=["id"], target_files=4)
    store.create_branch("t", "audit")
    bv = store.branch("audit")
    bv.write_append(
        spark.range(1000, 1500).toDF("id").withColumn("v", F.lit(7)),
        "t",
    )
    # main keeps writing after the fork: invisible to the audit view
    store.write_append(
        spark.range(9000, 9100).toDF("id").withColumn("v", F.lit(1)), "t"
    )
    r = bv.agg_where("t", [("min", "id"), ("max", "id"), ("count", "*")])
    assert r["aggs"] == {"min_id": 0, "max_id": 1499, "count_star": 1500}
    assert r["files_scanned"] == 0  # manifest-answered WAP audit
    assert bv.count_where("t", [("id", ">=", 1000)])["count"] == 500
    m = store.agg_where("t", [("max", "id"), ("count", "*")])
    assert m["aggs"] == {"max_id": 9099, "count_star": 1100}
    # version= time travel through the branch view: the fork base
    base = store._read_ref("t", "audit")["base"]
    rb = bv.agg_where("t", [("count", "*")], version=base)
    assert rb["aggs"]["count_star"] == 1000
    # after publish (rebase: main advanced with appends post-fork),
    # main's pushdown sees the audited rows
    store.publish_branch("t", "audit", mode="rebase-appends")
    p = store.agg_where("t", [("count", "*")], [("id", "<", 2000)])
    assert p["aggs"]["count_star"] == 1500
