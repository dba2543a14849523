"""Per-file SUM harvest → sum/avg metadata tier (r14): parquet footers
carry min/max/null-count but no sums, so ``agg_where`` used to scan
every matching file for any sum/avg-bearing list. The store now
harvests per-file column SUMs for integral columns at staging
(``harvest_sums=True``: one column-pruned job over the just-written
files) or by backfill (``build_sum_stats``), making sum/avg
metadata-answerable with the same three-tier classification — a
capability no mainstream format (Delta/Iceberg) ships, possible here
because the store owns its manifests.

Gates: exact vs a full-scan truth across tier mixes, zero-scan plans
on covered ranges (poisoned), avg decomposition (sum+count folding,
not per-file averages), null/all-null semantics, un-harvested (float /
missing) columns degrade to scan, DV poisoning, the distributed
classifier twin, and the repair_metadata backfill being CDF-silent and
diff-peelable.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark import manifest as mf
from pyairbyte_spark.writers import CommitLogTableStore


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(
        spark, str(tmp_path / "wh"), "main", harvest_sums=True
    )


def _seed(spark, store, n=20000, files=8):
    df = (
        spark.range(0, n)
        .toDF("id")
        .withColumn("v", (F.col("id") * 7919) % 1000)
        .withColumn("f", (F.col("id") % 97).cast("double"))
    )
    store.write_append(df.coalesce(files), "t", None)
    store.compact("t", sort_by=["id"], target_files=files)
    return df


def _truth(df, preds_col, *exprs):
    base = df.filter(preds_col) if preds_col is not None else df
    return tuple(base.agg(*exprs).collect()[0])


def test_sum_avg_metadata_tier_exact(spark, store):
    df = _seed(spark, store)
    # unfiltered: pure metadata, zero files read
    r = store.agg_where("t", [("sum", "v"), ("avg", "v")])
    s, c = _truth(df, None, F.sum("v"), F.count("v"))
    assert r["aggs"]["sum_v"] == s
    assert r["aggs"]["avg_v"] == s / c
    assert r["files_scanned"] == 0
    assert r["files_metadata"] == r["files_total"]
    # clustered range: interior files from metadata, boundary scanned
    r = store.agg_where(
        "t", [("sum", "v"), ("count", "*"), ("min", "id")],
        [("id", "<", 7500)],
    )
    s2 = _truth(df, F.col("id") < 7500, F.sum("v"))[0]
    assert r["aggs"]["sum_v"] == s2
    assert r["aggs"]["count_star"] == 7500
    assert r["aggs"]["min_id"] == 0
    assert r["files_metadata"] >= 2 and r["files_scanned"] >= 1
    # empty match set: SQL semantics (sum NULL, count 0)
    r = store.agg_where(
        "t", [("sum", "v"), ("count", "v")], [("id", ">", 10 ** 9)]
    )
    assert r["aggs"]["sum_v"] is None and r["aggs"]["count_v"] == 0


def test_covered_range_never_reads_data(spark, store, monkeypatch):
    _seed(spark, store)
    monkeypatch.setattr(
        store,
        "_entries_df",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("metadata-answerable sum read data")
        ),
    )
    r = store.agg_where("t", [("sum", "v"), ("avg", "id")])
    assert r["files_scanned"] == 0 and r["aggs"]["sum_v"] == 9990000


def test_unharvested_columns_scan_and_stay_exact(spark, tmp_path):
    # store WITHOUT harvest: sums absent -> every matching file scans
    spark_store = CommitLogTableStore(spark, str(tmp_path / "w2"), "main")
    df = _seed(spark, spark_store, n=5000, files=4)
    r = spark_store.agg_where("t", [("sum", "v")], [("id", "<", 2500)])
    assert r["aggs"]["sum_v"] == _truth(
        df, F.col("id") < 2500, F.sum("v")
    )[0]
    assert r["files_metadata"] == 0


def test_float_column_sums_scan(spark, store):
    df = _seed(spark, store, n=4000, files=4)
    # doubles are order-dependent: never harvested, always scan-tier
    r = store.agg_where("t", [("sum", "f")])
    assert r["files_metadata"] == 0
    assert r["aggs"]["sum_f"] == pytest.approx(
        _truth(df, None, F.sum("f"))[0]
    )
    # but mixing a float sum with an int sum degrades BOTH files'
    # classification together (one tier per file), staying exact
    r = store.agg_where("t", [("sum", "f"), ("sum", "v")])
    assert r["aggs"]["sum_v"] == _truth(df, None, F.sum("v"))[0]


def test_null_semantics(spark, store):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30), (4, None)], "id long, v long"
    )
    store.write_append(df.coalesce(1), "t", None)
    r = store.agg_where("t", [("sum", "v"), ("avg", "v"), ("count", "v")])
    assert r["aggs"]["sum_v"] == 40
    assert r["aggs"]["avg_v"] == 20.0
    assert r["aggs"]["count_v"] == 2
    # an ALL-null file has no footer min/max for the column, so the
    # harvest records no stat at all — it conservatively scans (and
    # contributes nothing), keeping the total exact
    allnull = spark.createDataFrame(
        [(5, None), (6, None)], "id long, v long"
    )
    store.write_append(allnull.coalesce(1), "t", None)
    r = store.agg_where("t", [("sum", "v")])
    assert r["aggs"]["sum_v"] == 40 and r["files_scanned"] == 1


def test_dv_poisoning_scans_exact(spark, store):
    df = _seed(spark, store, n=5000, files=4)
    store.delete_where("t", [[("id", "<", 10)]], mode="mor")
    r = store.agg_where("t", [("sum", "v")], [("id", "<", 2500)])
    want = _truth(
        df.filter(F.col("id") >= 10), F.col("id") < 2500, F.sum("v")
    )[0]
    assert r["aggs"]["sum_v"] == want
    assert r["files_metadata"] == 0


def test_backfill_build_sum_stats(spark, tmp_path, monkeypatch):
    st = CommitLogTableStore(spark, str(tmp_path / "w3"), "main")
    df = _seed(spark, st, n=8000, files=4)
    r0 = st.agg_where("t", [("sum", "v")])
    assert r0["files_metadata"] == 0  # un-harvested
    r = st.build_sum_stats("t")
    assert r["files_summed"] == 4 and set(r["columns"]) == {"id", "v"}
    # second call: nothing left to sum, no commit churn
    v = st.latest_version("t")
    assert st.build_sum_stats("t")["files_summed"] == 0
    assert st.latest_version("t") == v
    monkeypatch.setattr(
        st,
        "_entries_df",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("backfilled sum read data")
        ),
    )
    r1 = st.agg_where("t", [("sum", "v"), ("avg", "v")])
    s, c = _truth(df, None, F.sum("v"), F.count("v"))
    assert r1["aggs"]["sum_v"] == s and r1["aggs"]["avg_v"] == s / c
    assert r1["files_scanned"] == 0
    monkeypatch.undo()
    # the repair commit is row-preserving: CDF-silent and diff-peelable
    assert st.read_changes("t", v, v).count() == 0 if hasattr(
        st, "read_changes"
    ) else True
    d = st.diff_snapshots("t", v - 1, v, ["id"])
    assert d is not None and d.count() == 0


def test_distributed_classifier_folds_sums(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(mf, "PARQUET_CHECKPOINT_MIN_ENTRIES", 1)
    dist = CommitLogTableStore(
        spark, str(tmp_path / "wh"), "main", harvest_sums=True
    )
    dist.DISTRIBUTED_MANIFEST_MIN_BYTES = 0
    drv = CommitLogTableStore(
        spark, str(tmp_path / "wh"), "main", harvest_sums=True
    )
    df = _seed(spark, drv)
    for preds in (
        None,
        [("id", "<", 7500)],
        [[("id", "<", 100)], [("id", ">=", 19900)]],
        [("v", "<", 500)],
    ):
        a = drv.agg_where(
            "t", [("sum", "v"), ("count", "*"), ("max", "id")], preds
        )
        b = dist.agg_where(
            "t", [("sum", "v"), ("count", "*"), ("max", "id")], preds
        )
        assert a["aggs"] == b["aggs"], (preds, a, b)
    # unfiltered distributed sum: all-metadata plan
    r = dist.agg_where("t", [("sum", "v"), ("avg", "v")])
    s, c = _truth(df, None, F.sum("v"), F.count("v"))
    assert r["aggs"]["sum_v"] == s and r["aggs"]["avg_v"] == s / c
    assert r["files_scanned"] == 0


def test_distributed_metadata_answer_skips_scan_collect(
    spark, tmp_path, monkeypatch
):
    """A metadata-answered distributed agg_where (zero boundary
    files) must not launch the scan-rows collect: one classifier
    fold is the whole plan. Pinned by job count in a dedicated job
    group (same technique as the changeless-sync guards)."""
    monkeypatch.setattr(mf, "PARQUET_CHECKPOINT_MIN_ENTRIES", 1)
    st = CommitLogTableStore(
        spark, str(tmp_path / "wh"), "main", harvest_sums=True
    )
    st.DISTRIBUTED_MANIFEST_MIN_BYTES = 0
    _seed(spark, st)
    aggs = [("sum", "v"), ("count", "*")]
    sc = spark.sparkContext
    # warm once (sidecar read + Python workers), then count jobs
    st.agg_where("t", aggs)
    sc.setJobGroup("agg-meta-guard", "metadata-answered agg_where")
    try:
        r0 = st.agg_where("t", aggs)
    finally:
        sc.setJobGroup(None, None)
    assert r0["files_scanned"] == 0
    meta_jobs = len(
        sc.statusTracker().getJobIdsForGroup("agg-meta-guard")
    )
    # a boundary-range call from the same store pays MORE jobs (the
    # scan collect + the boundary read) — the zero-scan call must not
    sc.setJobGroup("agg-range-guard", "boundary agg_where")
    try:
        r1 = st.agg_where("t", aggs, [("id", "<", 2500)])
    finally:
        sc.setJobGroup(None, None)
    assert r1["files_scanned"] >= 1
    range_jobs = len(
        sc.statusTracker().getJobIdsForGroup("agg-range-guard")
    )
    assert meta_jobs < range_jobs, (meta_jobs, range_jobs)
    assert meta_jobs <= 2, meta_jobs  # the classifier fold only


def test_sums_survive_compact_and_merge(spark, store):
    _seed(spark, store, n=6000, files=4)
    store.merge_into(
        "t",
        spark.createDataFrame([(i,) for i in range(0, 50)], "id long"),
        ["id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    store.compact("t", sort_by=["id"])
    cur = store.read("t")
    want = cur.agg(F.sum("v")).collect()[0][0]
    r = store.agg_where("t", [("sum", "v")])
    assert r["aggs"]["sum_v"] == want and r["files_scanned"] == 0


def test_cache_tool_and_mcp_surface(spark, tmp_path):
    """The sum tier through every user surface: SparkCache(
    harvest_sums=True) write-time harvest, cache.agg_stream_rows /
    build_sum_stats, the tools wrappers, and MCP registration."""
    from pyairbyte_spark import tools
    from pyairbyte_spark.cache import SparkCache
    from pyairbyte_spark.mcp_server import TOOL_DEFS

    cache = SparkCache(
        spark,
        str(tmp_path / "cwh"),
        table_format="commitlog",
        harvest_sums=True,
    )
    cache.write_dataframe(
        spark.range(0, 1000).toDF("id").withColumn("v", F.col("id") % 10),
        "nums",
    )
    r = tools.aggregate_table_rows(
        cache, "nums", [["sum", "v"], ["avg", "v"], ["count", "*"]]
    )
    assert r["aggs"]["sum_v"] == 4500
    assert r["aggs"]["avg_v"] == 4.5
    assert r["aggs"]["count_star"] == 1000
    assert r["files_scanned"] == 0  # harvested at write time
    # backfill surface on an un-harvested cache
    plain = SparkCache(
        spark, str(tmp_path / "pwh"), table_format="commitlog"
    )
    plain.write_dataframe(
        spark.range(0, 100).toDF("id").withColumn("v", F.col("id")),
        "nums",
    )
    rb = tools.build_table_sum_stats(plain, "nums", ["v"])
    assert rb["files_summed"] >= 1
    r2 = tools.aggregate_table_rows(plain, "nums", [["sum", "v"]])
    assert r2["aggs"]["sum_v"] == 4950 and r2["files_scanned"] == 0
    names = {d.name for d in TOOL_DEFS}
    assert {"aggregate_table_rows", "build_table_sum_stats"} <= names


def test_doctor_prescribes_and_heals_sum_coverage(spark, tmp_path):
    """A non-harvesting writer's append sheds sum coverage; the doctor
    notices (O(manifest)) and apply_maintenance_plan re-covers it."""
    h = CommitLogTableStore(
        spark, str(tmp_path / "wh"), "main", harvest_sums=True
    )
    _seed(spark, h, n=4000, files=4)
    plain = CommitLogTableStore(spark, str(tmp_path / "wh"), "main")
    plain.write_append(
        spark.range(4000, 5000)
        .toDF("id")
        .withColumn("v", (F.col("id") * 7919) % 1000)
        .withColumn("f", (F.col("id") % 97).cast("double"))
        .coalesce(1),
        "t",
        None,
    )
    plan = h.maintenance_plan("t")
    acts = {r["action"] for r in plan}
    assert "build_sum_stats" in acts
    r = h.apply_maintenance_plan(
        plan={"tables": {"t": plan}, "indexes": {}, "txn_decisions": {}}
    )
    by = {(a["target"], a["action"]): a["status"] for a in r["actions"]}
    assert by[("t", "build_sum_stats")] == "applied"
    out = h.agg_where("t", [("sum", "v")])
    assert out["files_scanned"] == 0
    assert h.maintenance_plan("t") == [] or all(
        a["action"] != "build_sum_stats" for a in h.maintenance_plan("t")
    )


def test_bucketed_harvest_matches_per_file(spark, tmp_path):
    """A bucketed stage writes the SAME part-file basename under every
    bucket partition dir — the harvest must match per-file sums by the
    dir-relative path, or bucket A's sum lands on bucket B's stats
    (wrong answers, caught only on bucketed tables)."""
    st = CommitLogTableStore(
        spark, str(tmp_path / "wh"), "main",
        merge_buckets=8, harvest_sums=True,
    )
    df = (
        spark.range(0, 20000)
        .toDF("id")
        .withColumn("v", (F.col("id") * 7919) % 1000)
    )
    st.write_append(df, "t", ["id"])
    # per-file stats must each equal a real per-file sum: the total
    # folds exactly, and every single-bucket slice answers exactly
    r = st.agg_where("t", [("sum", "v"), ("count", "*")])
    assert r["aggs"]["sum_v"] == df.agg(F.sum("v")).collect()[0][0]
    assert r["files_scanned"] == 0
    man = st._read_manifest("t", st.latest_version("t"))
    for e in man["entries"]:
        for f in e.get("files") or []:
            cs = (f.get("stats") or {}).get("v") or {}
            if "sum" not in cs:
                continue
            p = f"{st.table_path('t')}/{e['path']}/{f['path']}"
            truth = spark.read.parquet(p).agg(F.sum("v")).collect()[0][0]
            assert cs["sum"] == truth, (f["path"], cs["sum"], truth)
