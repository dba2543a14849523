"""Write-time clustering (``set_cluster_by``): tables with the
property range-sort every append on the cluster keys before staging,
so zone maps stay selective through ingest — no compaction needed for
fresh data to prune (the liquid-clustering idea; Delta's OPTIMIZE-only
clustering decays between maintenance runs).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.writers import CommitLogTableStore


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path / "wh"), "main")


def _batch(spark, lo, hi, parts=4):
    return (
        spark.range(lo, hi)
        .toDF("id")
        .withColumn("v", (F.col("id") * 7919) % 1000)
        .repartition(parts)  # deliberately scrambled
    )


def test_clustered_appends_prune_without_compact(spark, store):
    store.write_append(_batch(spark, 0, 4000), "t", None)
    store.set_cluster_by("t", ["id"])
    for i in range(1, 4):
        store.write_append(_batch(spark, i * 4000, (i + 1) * 4000), "t", None)
    # post-property appends land range-sorted with disjoint per-file id
    # ranges, so a tail probe opens at most ONE of them (+ the scrambled
    # pre-property files, untouched by the metadata commit). Derive the
    # file split from the ACTUAL manifest rather than assuming a fan-out:
    # size-adaptive staging may land each micro-append as a single file.
    plan = store.plan_scan("t", [("id", ">=", 15990)])
    snap = store._latest_commit("t")
    stamped = [
        e for e in snap[1]["entries"] if e.get("sorted_by") == ["id"]
    ]
    assert len(stamped) == 3  # one stamped entry per clustered append
    n_post = sum(len(e.get("files") or []) for e in stamped)
    assert n_post >= 3
    pre_property_files = plan["files_total"] - n_post
    assert pre_property_files >= 4  # the scrambled pre-property batch
    assert plan["files_selected"] <= pre_property_files + 1
    # all-but-one of the disjoint sorted post-property files prune
    assert plan["files_selected"] <= plan["files_total"] - (n_post - 1)
    # counts stay exact and mostly metadata-answered on the sorted tail
    r = store.count_where("t", [("id", ">=", 8000)])
    assert r["count"] == 8000


def test_cluster_property_clears_and_validates(spark, store):
    store.write_append(_batch(spark, 0, 100), "t", None)
    with pytest.raises(ValueError, match="does not exist"):
        store.set_cluster_by("t", ["nope"])
    store.set_cluster_by("t", ["id"])
    store.set_cluster_by("t", None)  # clear
    store.write_append(_batch(spark, 100, 200), "t", None)
    snap = store._latest_commit("t")
    assert not any(e.get("sorted_by") for e in snap[1]["entries"])
    # the property commit itself is row-silent in the change feed
    assert store.read_changes("t", 1).filter(
        F.col("_change_type").isin("insert", "delete")
    ).count() == 100  # only the second append's rows


def test_cluster_by_keeps_index_coverage_at_one(spark, store):
    from pyairbyte_spark.operators.search import (
        append_to_text_index,
        build_text_index,
        text_index_coverage,
        text_index_search,
    )

    docs = spark.createDataFrame(
        [(1, "spark data"), (2, "join window")], "doc_id long, text string"
    )
    build_text_index(docs, store, "ti", target_files=2)
    store.set_cluster_by("ti_postings", ["token"])
    append_to_text_index(
        spark.createDataFrame(
            [(3, "spark appended")], "doc_id long, text string"
        ),
        store,
        "ti",
    )
    # the clustered write keeps the coverage watermark at 1.0 — no
    # refresh cycle needed for ingest-time appends
    assert text_index_coverage(store, "ti")["coverage"] == 1.0
    assert (
        text_index_search(store, "ti", ["appended"]).collect()[0]["doc_id"]
        == 3
    )


def test_cluster_by_on_bucketed_table(spark, store):
    df = _batch(spark, 0, 2000).withColumn(
        "_airbyte_raw_id", F.concat(F.lit("r"), F.col("id"))
    ).withColumn(
        "_airbyte_extracted_at", F.lit("2024-01-01").cast("timestamp")
    )
    st = CommitLogTableStore(
        spark, store.root, "main", merge_buckets=4
    )
    st.write_merge(df, "t", ["id"])
    st.set_cluster_by("t", ["v"])
    st.write_append(
        _batch(spark, 2000, 4000).withColumn(
            "_airbyte_raw_id", F.concat(F.lit("s"), F.col("id"))
        ).withColumn(
            "_airbyte_extracted_at", F.lit("2024-01-02").cast("timestamp")
        ),
        "t",
        ["id"],
    )
    # appended rows stay bucket-routed AND v-sorted; a later merge on
    # id must still pair correctly across the clustered append
    assert st.read("t").count() == 4000
    st.write_merge(
        df.limit(0).unionByName(
            spark.createDataFrame(
                [(2500, 9999, "u2500", "2024-01-03 00:00:00")],
                "id long, v long, _airbyte_raw_id string, "
                "_airbyte_extracted_at string",
            ).withColumn(
                "_airbyte_extracted_at",
                F.col("_airbyte_extracted_at").cast("timestamp"),
            )
        ),
        "t",
        ["id"],
    )
    assert st.read("t").count() == 4000  # upsert, not insert
    assert (
        st.read("t").filter(F.col("id") == 2500).collect()[0]["v"] == 9999
    )


def test_cluster_by_in_txn_group(spark, store):
    store.write_append(_batch(spark, 0, 100), "a", None)
    store.write_append(_batch(spark, 0, 100), "b", None)
    t = store.begin_txn()
    t.set_cluster_by("a", ["id"])
    t.set_cluster_by("b", ["id"])
    t.commit()
    for tbl in ("a", "b"):
        snap = store._latest_commit(tbl)
        assert snap[1].get("cluster_by") == ["id"], tbl
