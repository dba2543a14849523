"""Per-file bloom-filter point-lookup index (bloom.py + writers.py).

Zone maps cannot prune equality lookups on high-cardinality unsorted
keys (every file's [min, max] spans the domain); the bloom index can.
The exactness contract: results with and without the index are
IDENTICAL — skipping only removes files that provably contain no match.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark import bloom as bl
from pyairbyte_spark import manifest as mf
from pyairbyte_spark.writers import CommitLogTableStore


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path / "wh"), "main")


def _batch(spark, lo, hi):
    """High-cardinality unsorted keys: md5 strings span the full hex
    range in EVERY file, so string zone maps prune nothing."""
    return (
        spark.range(lo, hi)
        .withColumn("key", F.md5(F.col("id").cast("string")))
        .withColumn("v", F.col("id") * 2)
        .withColumn("_airbyte_raw_id", F.col("id").cast("string"))
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
        .coalesce(1)
    )


def _key_of(spark, i):
    return spark.range(i, i + 1).select(
        F.md5(F.col("id").cast("string"))
    ).first()[0]


def _seed(spark, store, n_files=6, per=500):
    for i in range(n_files):
        store.write_append(_batch(spark, i * per, (i + 1) * per), "t")


def test_unit_bloom_roundtrip():
    m, k = bl.size_bits(1000, 0.01)
    bits = bl.build_bits([str(i) for i in range(1000)], m, k)
    assert all(bl.maybe_contains(bits, m, k, str(i)) for i in range(1000))
    misses = sum(
        bl.maybe_contains(bits, m, k, f"x{i}") for i in range(2000)
    )
    assert misses < 2000 * 0.05  # ~1% target, generous bound


def test_point_lookup_prunes_files(spark, store):
    _seed(spark, store)
    r = store.build_bloom_index("t", ["key"])
    assert r["files_indexed"] == 6
    key = _key_of(spark, 1234)  # lives in file 2
    # without the index (fresh store over same warehouse, older version)
    pre = store.plan_scan("t", [("key", "=", key)], version=6)
    assert pre["files_selected"] == 6  # zone maps prune nothing
    post = store.plan_scan("t", [("key", "=", key)])
    assert post["files_selected"] <= 2  # the true file + rare fps
    got = store.read_where("t", [("key", "=", key)]).collect()
    assert len(got) == 1 and got[0]["id"] == 1234


def test_in_and_or_predicates_exact(spark, store):
    _seed(spark, store)
    store.build_bloom_index("t", ["key"])
    keys = [_key_of(spark, i) for i in (5, 777, 2999)]
    plan = store.plan_scan("t", [("key", "in", tuple(keys))])
    assert plan["files_selected"] <= 4
    got = sorted(
        r["id"]
        for r in store.read_where("t", [("key", "in", tuple(keys))]).collect()
    )
    assert got == [5, 777, 2999]
    # absent key: every file pruned, empty exact result
    none = store.read_where("t", [("key", "=", "no-such-key")])
    assert none.count() == 0


def test_exactness_sweep_vs_unindexed(spark, store, tmp_path):
    """Many lookups: indexed results == unindexed results, row for
    row (false positives only cost I/O, never correctness)."""
    plain = CommitLogTableStore(spark, str(tmp_path / "wh2"), "main")
    _seed(spark, store, n_files=4, per=250)
    _seed(spark, plain, n_files=4, per=250)
    store.build_bloom_index("t", ["key", "id"])
    cols = ["id", "key", "v"]  # extracted_at differs between seeds

    def rows(s, preds):
        return sorted(
            map(tuple, s.read_where("t", preds).select(*cols).collect())
        )

    for i in (0, 13, 999, 500, 123456):
        k = _key_of(spark, i)
        assert rows(store, [("key", "=", k)]) == rows(
            plain, [("key", "=", k)]
        ), i
        assert rows(store, [("id", "=", i)]) == rows(
            plain, [("id", "=", i)]
        ), i


def test_post_build_appends_conservative_then_only_missing(spark, store):
    _seed(spark, store, n_files=2)
    store.build_bloom_index("t", ["key"])
    store.write_append(_batch(spark, 5000, 5500), "t")  # uncovered
    key = _key_of(spark, 5100)
    plan = store.plan_scan("t", [("key", "=", key)])
    # covered files bloom-pruned; the new file kept conservatively
    assert plan["files_selected"] == 1
    assert store.read_where("t", [("key", "=", key)]).count() == 1
    r = store.build_bloom_index("t", ["key"], only_missing=True)
    assert r["files_indexed"] == 1  # only the uncovered file scanned
    # absent key now prunes everything including the new file
    assert store.plan_scan("t", [("key", "=", "nope")])["files_selected"] == 0


def test_index_survives_commits_and_guards(spark, store):
    _seed(spark, store, n_files=2)
    store.build_bloom_index("t", ["key"])
    store.write_append(_batch(spark, 9000, 9100), "t")
    store.delete_where("t", [("id", "<", 10)])
    man = store._read_manifest("t", store.latest_version("t"))
    assert man.get("bloom_index"), "index reference must be carried"
    with pytest.raises(ValueError, match="string/integral"):
        store.build_bloom_index("t", ["_airbyte_extracted_at"])
    with pytest.raises(ValueError, match="unknown column"):
        store.build_bloom_index("t", ["zz"])
    # the change feed skips the set_bloom_index commit
    vs = [
        v for v in range(1, store.latest_version("t") + 1)
        if store._read_manifest("t", v)["op"] == "set_bloom_index"
    ]
    assert vs
    assert store.read_changes("t", vs[0] - 1, vs[0]).count() == 0


def test_vacuum_reclaims_superseded_index(spark, store):
    _seed(spark, store, n_files=2)
    store.build_bloom_index("t", ["key"])
    ref1 = store._read_manifest("t", store.latest_version("t"))[
        "bloom_index"
    ]["ref"]
    store.build_bloom_index("t", ["key"])  # rebuild supersedes ref1
    ref2 = store._read_manifest("t", store.latest_version("t"))[
        "bloom_index"
    ]["ref"]
    assert ref1 != ref2
    removed = store.vacuum("t", keep_commits=1)
    assert ref1 in removed and ref2 not in removed
    key = _key_of(spark, 1)
    assert store.read_where("t", [("key", "=", key)]).count() == 1


def test_distributed_path_blooms_equivalently(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(mf, "PARQUET_CHECKPOINT_MIN_ENTRIES", 1)
    dist = CommitLogTableStore(spark, str(tmp_path / "wh"), "main")
    drv = CommitLogTableStore(spark, str(tmp_path / "wh"), "main")
    _seed(spark, dist, n_files=4, per=300)
    dist.build_bloom_index("t", ["key"])
    dist.DISTRIBUTED_MANIFEST_MIN_BYTES = 0
    dist._invalidate_manifests("t")
    key = _key_of(spark, 700)
    p_dist = dist.plan_scan("t", [("key", "=", key)])
    p_drv = drv.plan_scan("t", [("key", "=", key)])
    assert p_dist.get("distributed") is True
    assert p_dist["files_selected"] == p_drv["files_selected"] < 4
    a = sorted(map(tuple, dist.read_where("t", [("key", "=", key)]).collect()))
    b = sorted(map(tuple, drv.read_where("t", [("key", "=", key)]).collect()))
    assert a == b and len(a) == 1


def test_bloom_on_bucketed_table(spark, tmp_path):
    """Bucketed layouts (files inside __pk_bucket= dirs): the build's
    file-key extraction and the probe's pruning both work; results
    exact."""
    store = CommitLogTableStore(
        spark, str(tmp_path / "b"), "main", merge_buckets=8
    )
    df = (
        spark.range(0, 2000)
        .withColumn("key", F.md5(F.col("id").cast("string")))
        .withColumn("_airbyte_raw_id", F.col("id").cast("string"))
        .withColumn(
            "_airbyte_extracted_at", F.lit("2026-01-01").cast("timestamp")
        )
    )
    store.write_merge(df, "t", ["id"])
    r = store.build_bloom_index("t", ["key"])
    assert r["files_indexed"] > 8
    key = _key_of(spark, 55)
    plan = store.plan_scan("t", [("key", "=", key)])
    assert plan["files_selected"] < plan["files_total"] // 4
    got = store.read_where("t", [("key", "=", key)]).collect()
    assert len(got) == 1 and got[0]["id"] == 55
