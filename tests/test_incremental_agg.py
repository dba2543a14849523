"""Incrementally maintained aggregates (operators/incremental.py) and
the CDF update pre-images they consume.

The maintenance identity under test: for any window of commits,
    materialize(v0) ⊕ delta(changes v0→vN) == materialize(vN)
with sign arithmetic (+post/-pre), decimal-exact, never rescanning the
base table. Plus: the default feed is unchanged (no preimages unless
asked), preimages pair 1:1 with postimages, and the 'upsert' legacy
change type fails loudly instead of corrupting state.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.operators import incremental as inc
from pyairbyte_spark.writers import CommitLogTableStore


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path / "wh"), "main")


def _seed(spark, store, n=500):
    df = (
        spark.range(0, n)
        .withColumn("grp", (F.col("id") % 5).cast("int"))
        .withColumn(
            "v", (F.col("id") % 100).cast("decimal(18,2)")
        )
        .repartitionByRange(4, "grp")
    )
    store.write_append(df, "t")
    return df


def _recompute(store):
    return {
        tuple(r)
        for r in inc.materialize_sums(
            store.read("t"), ["grp"], ["v"]
        ).collect()
    }


def test_maintenance_equals_recompute_across_dml(spark, store):
    _seed(spark, store)  # v1
    state = inc.materialize_sums(
        store.read_version("t", 1), ["grp"], ["v"]
    )
    extra = (
        spark.range(1000, 1100)
        .withColumn("grp", (F.col("id") % 5).cast("int"))
        .withColumn("v", F.lit(7).cast("decimal(18,2)"))
    )
    store.write_append(extra, "t")  # v2
    store.delete_where("t", [("grp", "=", 2)], mode="mor")  # v3
    store.delete_where("t", [("id", "<", 50)])  # v4 (COW)
    store.update_where(
        "t", [("grp", "=", 4)], {"v": "CAST(v + 10.00 AS DECIMAL(18,2))"}
    )  # v5
    state, ver = inc.refresh_sums(store, "t", state, 1, ["grp"], ["v"])
    assert ver == 5
    assert {tuple(r) for r in state.collect()} == _recompute(store)
    # a deleted-to-zero group disappears from the state
    assert not [r for r in state.collect() if r["grp"] == 2]


def test_refresh_is_a_noop_at_the_watermark(spark, store):
    _seed(spark, store)
    state = inc.materialize_sums(store.read("t"), ["grp"], ["v"])
    state2, ver = inc.refresh_sums(store, "t", state, 1, ["grp"], ["v"])
    assert ver == 1 and state2 is state


def test_incremental_windows_compose(spark, store):
    """Consuming v1→v3 then v3→v5 equals consuming v1→v5."""
    _seed(spark, store)
    state0 = inc.materialize_sums(
        store.read_version("t", 1), ["grp"], ["v"]
    )
    store.delete_where("t", [("grp", "=", 0)], mode="mor")  # v2
    store.update_where(
        "t", [("grp", "=", 1)], {"v": "CAST(v + 1.00 AS DECIMAL(18,2))"}
    )  # v3
    store.delete_where("t", [("id", ">=", 400)])  # v4
    store.update_where(
        "t", [("grp", "=", 3)], {"v": "CAST(0.50 AS DECIMAL(18,2))"}
    )  # v5
    s_a, _ = inc.refresh_sums(
        store, "t", state0, 1, ["grp"], ["v"], to_version=3
    )
    s_a, _ = inc.refresh_sums(store, "t", s_a, 3, ["grp"], ["v"])
    s_b, _ = inc.refresh_sums(store, "t", state0, 1, ["grp"], ["v"])
    assert {tuple(r) for r in s_a.collect()} == {
        tuple(r) for r in s_b.collect()
    }
    assert {tuple(r) for r in s_a.collect()} == _recompute(store)


def test_update_preimages_pair_with_postimages(spark, store):
    _seed(spark, store)
    store.update_where(
        "t", [("grp", "=", 1)], {"v": "CAST(v + 5.00 AS DECIMAL(18,2))"}
    )
    # default: unchanged contract, post-images only
    default = store.read_changes("t", 1, 2).collect()
    assert {r["_change_type"] for r in default} == {"update_postimage"}
    both = store.read_changes(
        "t", 1, 2, include_preimages=True
    ).collect()
    pre = [r for r in both if r["_change_type"] == "update_preimage"]
    post = [r for r in both if r["_change_type"] == "update_postimage"]
    assert len(pre) == len(post) == len(default) == 100
    pre_by_id = {r["id"]: r["v"] for r in pre}
    for r in post:
        assert r["v"] == pre_by_id[r["id"]] + 5


def test_merge_preimages(spark, store):
    store.merge_buckets = 4
    df = (
        spark.range(0, 200)
        .withColumn("grp", (F.col("id") % 5).cast("int"))
        .withColumn("v", F.lit(1).cast("decimal(18,2)"))
        .withColumn(
            "_airbyte_raw_id", F.concat(F.lit("a"), F.col("id"))
        )
        .withColumn(
            "_airbyte_extracted_at",
            F.lit("2026-01-01 00:00:00").cast("timestamp"),
        )
    )
    store.write_merge(df, "m", ["id"])
    upd = (
        spark.range(150, 250)
        .withColumn("grp", (F.col("id") % 5).cast("int"))
        .withColumn("v", F.lit(2).cast("decimal(18,2)"))
        .withColumn(
            "_airbyte_raw_id", F.concat(F.lit("b"), F.col("id"))
        )
        .withColumn(
            "_airbyte_extracted_at",
            F.lit("2026-01-02 00:00:00").cast("timestamp"),
        )
    )
    store.write_merge(upd, "m", ["id"])  # 50 updates + 50 inserts
    feed = store.read_changes("m", 1, 2, include_preimages=True)
    by_type = {
        r["_change_type"]: r["n"]
        for r in feed.groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by_type == {
        "insert": 50,
        "update_postimage": 50,
        "update_preimage": 50,
    }
    # maintenance through a merge window equals recompute
    state = inc.materialize_sums(
        store.read_version("m", 1), ["grp"], ["v"]
    )
    state = inc.apply_deltas(
        state, inc.delta_sums(feed, ["grp"], ["v"]), ["grp"]
    )
    expect = {
        tuple(r)
        for r in inc.materialize_sums(
            store.read("m"), ["grp"], ["v"]
        ).collect()
    }
    assert {tuple(r) for r in state.collect()} == expect


def test_upsert_change_type_fails_loudly(spark):
    feed = spark.createDataFrame(
        [(1, 2.0, "upsert")], ["grp", "v", "_change_type"]
    )
    with pytest.raises(Exception, match="cannot consume"):
        inc.delta_sums(feed, ["grp"], ["v"]).collect()


def test_decimal_columns_survive_stats_harvest(spark, store):
    """Regression: DECIMAL parquet stats aren't pyarrow-decodable; the
    harvest must omit the column (never-prune), not crash the write."""
    df = _seed(spark, store)
    man = store._latest_commit("t")[1]
    stats_cols = set()
    for e in man["entries"]:
        for f in e["files"]:
            stats_cols |= set((f.get("stats") or {}).keys())
    assert "grp" in stats_cols  # other columns still harvest
    assert "v" not in stats_cols  # decimal omitted, not fatal
    # predicating on the stat-less column is conservative-correct
    assert store.read_where("t", [("v", "=", 3)]).count() == 5
    r = store.delete_where("t", [("v", "=", 3)])
    assert r["deleted_rows"] == 5


# -- min/max maintenance ------------------------------------------------------


def _recompute_mm(store):
    return {
        tuple(r)
        for r in inc.materialize_aggs(
            store.read("t"), ["grp"], ["v"], ["v"]
        ).collect()
    }


def test_minmax_maintenance_across_dml(spark, store):
    """min/max maintain correctly across the full DML mix: inserts
    fold in free; deleting a group's extremum re-aggregates only that
    group; non-extremum deletes stay clean; updates move extremums."""
    _seed(spark, store)  # v1: grp 0..4, v = id % 100
    state = inc.materialize_aggs(
        store.read_version("t", 1), ["grp"], ["v"], ["v"]
    )
    # v2: inserts extend max for grp 0 only
    df2 = (
        spark.range(1000, 1003)
        .withColumn("grp", F.lit(0))
        .withColumn("v", F.lit(500).cast("decimal(18,2)"))
    )
    store.write_append(df2, "t")
    # v3: delete the rows holding v=0 (the min of grp 0) — extremum gone
    store.delete_where("t", [("v", "=", 0)])
    # v4: delete a non-extremum value from grp 1
    store.delete_where("t", [("v", "=", 41)])
    # v5: update pushes grp 2's max down (92 -> 1.00)
    store.update_where(
        "t", [("v", "=", 92)], {"v": "CAST(1.00 AS DECIMAL(18,2))"}
    )
    state, ver = inc.refresh_aggs(
        store, "t", state, 1, ["grp"], ["v"], ["v"]
    )
    assert ver == store.latest_version("t")
    assert {tuple(r) for r in state.collect()} == _recompute_mm(store)


def test_minmax_group_drop_and_insert_only(spark, store):
    """A fully-deleted group leaves the state; a brand-new group
    enters with insert-only min/max (no rescan needed)."""
    _seed(spark, store, n=50)
    state = inc.materialize_aggs(
        store.read_version("t", 1), ["grp"], ["v"], ["v"]
    )
    store.delete_where("t", [("grp", "=", 3)])
    df2 = (
        spark.range(2000, 2010)
        .withColumn("grp", F.lit(9))
        .withColumn("v", (F.col("id") - 2000).cast("decimal(18,2)"))
    )
    store.write_append(df2, "t")
    state, _ = inc.refresh_aggs(
        store, "t", state, 1, ["grp"], ["v"], ["v"]
    )
    got = {r["grp"]: r for r in state.collect()}
    assert 3 not in got
    assert got[9]["min_v"] == 0 and got[9]["max_v"] == 9
    assert {tuple(r) for r in state.collect()} == _recompute_mm(store)


def test_minmax_refresh_composes_over_windows(spark, store):
    """Two window refreshes == one refresh == recompute."""
    _seed(spark, store, n=100)
    s1 = inc.materialize_aggs(
        store.read_version("t", 1), ["grp"], ["v"], ["v"]
    )
    store.delete_where("t", [("v", ">=", 90)])  # drops maxes
    s2, v2 = inc.refresh_aggs(store, "t", s1, 1, ["grp"], ["v"], ["v"])
    store.update_where("t", [("v", "=", 0)], {"v": "CAST(77 AS DECIMAL(18,2))"})
    s3, _ = inc.refresh_aggs(store, "t", s2, v2, ["grp"], ["v"], ["v"])
    assert {tuple(r) for r in s3.collect()} == _recompute_mm(store)
