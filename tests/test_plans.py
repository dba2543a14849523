"""Physical-plan regression tests.

SCALE.md's claims about the plans (filter pushdown to the parquet scan,
pruned read schemas, broadcast dimension joins, top-k without a global
sort, map-side partial aggregation, whole-stage codegen) are asserted
here so a refactor can't silently trade them away. These inspect the
optimized/physical plan string — no data correctness (the oracle suite
covers that), only plan shape.
"""

from __future__ import annotations

import os

from pyairbyte_spark import plans
from pyairbyte_spark import queries as q

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
plan_str = plans.explain_str


def test_q6_filter_pushdown_and_column_pruning(spark):
    df = q.queries()["q6_forecast_revenue"](spark, SF_DIR)
    pushed = plans.pushed_filters(df)
    assert pushed and any(p for p in pushed), pushed
    # q6 needs 4 of lineitem's columns; the scan must not read more.
    assert all(len(cols) <= 4 for cols in plans.scan_columns(df))


def test_q5_broadcasts_dimension_tables(spark):
    assert plans.has_broadcast_join(
        q.queries()["q5_local_supplier_volume"](spark, SF_DIR)
    )


def test_topk_uses_take_ordered_not_global_sort(spark):
    assert plans.uses_take_ordered(q.queries()["sort_topk_orders"](spark, SF_DIR))


def test_q1_partial_aggregation_before_exchange(spark):
    plan = plan_str(q.queries()["q1_pricing_summary"](spark, SF_DIR), "simple")
    assert "partial_sum" in plan


def test_q1_wholestage_codegen(spark):
    # With AQE the codegen stages only appear in the FINAL adaptive
    # plan, so run the query before inspecting.
    df = q.queries()["q1_pricing_summary"](spark, SF_DIR)
    df.collect()
    plan = plan_str(df, "simple")
    assert "WholeStageCodegen" in plan or "*(" in plan


def test_pack_token_bins_default_has_no_global_window(spark):
    """The no-partition_col path must use the two-pass offset plan —
    never an unpartitioned Window funneling the corpus into one task."""
    from pyairbyte_spark.operators.curation import pack_token_bins

    df = spark.createDataFrame(
        [(i, 60) for i in range(100)], ["doc_id", "n_tokens"]
    )
    out = pack_token_bins(df, token_col="n_tokens", budget=100, id_col="doc_id")
    assert not plans.has_unpartitioned_window(out), plan_str(out, "extended")


def test_registered_curation_queries_have_no_global_window(spark):
    for key in (
        "pack_token_bins_docs",
        "pipeline_curation_shards",
        "chunk_documents_64",
        "mixture_weights_by_source",
        "weighted_sample_docs",
    ):
        df = q.queries()[key](spark, SF_DIR)
        assert not plans.has_unpartitioned_window(df), key


def test_ngram_jaccard_df_cap_filters_before_join(spark):
    """The hot-shingle document-frequency cap must prune BEFORE the
    self-join materializes the k² fan-out: in the physical plan the
    `__df <= cap` Filter sits below the join node, directly on top of
    the DF window."""
    from pyairbyte_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = ngram_jaccard_pairs(
        docs, "text", "doc_id", threshold=0.12, max_doc_frequency=50
    )
    plan = plan_str(df, "extended")
    join_pos = min(
        p for p in (plan.find("Join"), plan.find("BroadcastHashJoin")) if p >= 0
    )
    filter_pos = plan.find("__df")
    assert filter_pos >= 0, "DF-cap filter missing from plan"
    assert filter_pos > join_pos, "cap filter must be BELOW (after) the join node"


def test_sample_per_stratum_prefilter_in_plan(spark):
    """The giant-stratum guard: a hash-fraction Filter (conv on the
    md5 prefix) must sit before the rank window, fed by the
    per-stratum count aggregate, so no task ever sorts a whole
    stratum."""
    from pyairbyte_spark.operators.curation import sample_per_stratum

    df = spark.createDataFrame(
        [(i % 3, i) for i in range(1000)], ["cls", "id"]
    )
    out = sample_per_stratum(df, ["cls"], n=5, id_col="id")
    plan = plan_str(out, "extended")
    assert "conv(" in plan and "__stratum_n" in plan, plan
    # Guard off → no count join in the plan.
    plain = sample_per_stratum(df, ["cls"], n=5, id_col="id", prefilter=False)
    assert "__stratum_n" not in plan_str(plain, "extended")
    # Identical output either way (superset property).
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, plain.collect()))


def test_connected_components_plan_depth_bounded(spark):
    """Per-round localCheckpoint keeps the returned plan one round deep
    regardless of iteration count (a 33-node chain needs many rounds)."""
    from pyairbyte_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(32)], ["id_a", "id_b"]
    )
    cc = dedup.connected_components(pairs, max_iter=40)
    assert {r["component"] for r in cc.collect()} == {0}
    # Lineage is cut at the last checkpoint: a handful of plan lines,
    # not 40 rounds of joins.
    assert len(plan_str(cc, "simple").splitlines()) < 15


def test_merge_single_shuffle(spark, tmp_path):
    """Merge = one Exchange on the PK; the dedup window rides it."""
    from pyairbyte_spark import SparkCache
    from pyairbyte_spark.catalog import StreamSpec
    from pyairbyte_spark.processor import MessageStreamProcessor
    from pyairbyte_spark.sources.messages import AirbyteMessage, RecordMessage
    from pyairbyte_spark.strategies import WriteStrategy

    cache = SparkCache(spark, str(tmp_path))
    spec = StreamSpec(
        name="m",
        json_schema={"properties": {"id": {"type": "integer"}, "v": {"type": "string"}}},
        primary_keys=["id"],
    )
    msgs = [
        AirbyteMessage("RECORD", record=RecordMessage("m", {"id": i, "v": "x"}))
        for i in range(10)
    ]
    MessageStreamProcessor(
        cache, source_name="t", specs={"m": spec}, write_strategy=WriteStrategy.MERGE
    ).process_messages(iter(msgs))

    # Build the merge plan a second sync would run and count exchanges.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pyairbyte_spark.constants import AB_EXTRACTED_AT_COLUMN, AB_RAW_ID_COLUMN

    old = cache["m"].to_spark()
    incoming = old.filter("id < 5")
    w = Window.partitionBy("id").orderBy(
        F.col(AB_EXTRACTED_AT_COLUMN).desc(), F.col(AB_RAW_ID_COLUMN).desc()
    )
    merged = (
        old.unionByName(incoming)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    assert plans.shuffle_count(merged) <= 1, plan_str(merged, "simple")


def test_q2_broadcasts_dims_and_no_global_window(spark):
    """Q2's window min partitions by p_partkey (parallel keys, never a
    single-task global window) and every dimension join broadcasts."""
    df = q.queries()["q2_min_cost_supplier"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    assert "BroadcastHashJoin" in plan
    assert not plans.has_unpartitioned_window(df)


def test_q11_threshold_is_broadcast_not_shuffle_join(spark):
    """The one-row grand-total threshold must broadcast to the group
    values, not shuffle them."""
    df = q.queries()["q11_important_part_value"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q20_semi_join_and_part_filter_pushdown(spark):
    """Supplier qualification compiles to a semi join (no row blowup)
    and the widget-name filter reaches the part scan."""
    df = q.queries()["q20_excess_shipper_suppliers"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    assert "LeftSemi" in plan
    pushed = " ".join(plans.pushed_filters(df))
    assert "p_name" in pushed or "StringContains" in pushed, pushed


def test_semantic_dedup_no_cartesian_no_global_window(spark):
    """Within-cluster pair scoring must shuffle on cluster id — never a
    cartesian product over the corpus or a single-task global window.
    (Centroid assignment's broadcast nested-loop over the tiny centroid
    table is fine; an unbroadcast CartesianProduct is not.)"""
    df = q.queries()["dedup_semantic"](spark, SF_DIR)
    assert "CartesianProduct" not in plan_str(df, "simple")
    assert not plans.has_unpartitioned_window(df)


def test_vocab_topk_take_ordered_and_pruned_scan(spark):
    """Top-100 must compile to TakeOrderedAndProject (per-partition
    top-k, no global sort) and the documents scan must read only text."""
    df = q.queries()["text_vocab_topk"](spark, SF_DIR)
    assert plans.uses_take_ordered(df)
    assert all(cols == ["text"] for cols in plans.scan_columns(df))


def test_quantize_int8_no_shuffle_map_only(spark):
    """Quantization is a map-only column rewrite, and the registered
    stats query folds its checksum per row — zero Exchange nodes in
    either plan."""
    from pyairbyte_spark.operators.similarity import quantize_int8

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert plans.shuffle_count(quantize_int8(emb)) == 0
    assert plans.shuffle_count(q.queries()["embed_quantize_int8"](spark, SF_DIR)) == 0


def test_dsir_broadcasts_ratio_table_one_doc_shuffle(spark):
    """DSIR's 512-row log-ratio table must broadcast (never shuffle the
    exploded term stream against it), and the only nested-loop join
    allowed is the 1-row totals crossJoin."""
    df = q.queries()["dsir_importance_weights"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # the 1-row totals
    assert "SortMergeJoin" not in plan


def test_anomaly_zscore_broadcasts_stats_no_raw_window(spark):
    """The per-type stats table must broadcast back onto the daily
    aggregate; no window function may touch the raw event log."""
    df = q.queries()["events_anomaly_daily_zscore"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_unigram_logprob_scan_prunes_and_no_window(spark):
    """The LM-quality plan must read only (doc_id, text) and never use
    an unpartitioned window — two aggregates + one token join."""
    df = q.queries()["text_unigram_logprob"](spark, SF_DIR)
    assert all(
        set(cols) <= {"doc_id", "text"} for cols in plans.scan_columns(df)
    )
    assert not plans.has_unpartitioned_window(df)
    assert "CartesianProduct" not in plan_str(df, "simple")


def test_ngram_coverage_no_cartesian_no_global_window(spark):
    """Gram construction is per-row; the only joins are gram-keyed."""
    df = q.queries()["dedup_ngram_coverage"](spark, SF_DIR)
    assert "CartesianProduct" not in plan_str(df, "simple")
    assert not plans.has_unpartitioned_window(df)
    assert all(
        set(cols) <= {"doc_id", "text"} for cols in plans.scan_columns(df)
    )


def test_gopher_full_ruleset_map_only(spark):
    """The complete Gopher rule set (19 signals incl. per-n gram folds)
    is one per-row projection: zero Exchange nodes, pruned 2-column
    scan — per-document cost, corpus-size-independent."""
    df = q.queries()["text_gopher_quality"](spark, SF_DIR)
    assert plans.shuffle_count(df) == 0
    assert all(len(cols) <= 2 for cols in plans.scan_columns(df))


def test_contamination_single_scan_no_join(spark):
    """Contamination is ONE linear pipeline: a single documents scan,
    benchmark membership riding the DF-cap window (no self-join, no
    branch recomputation — the naive bench-join formulation re-ran the
    explode+distinct per branch)."""
    df = q.queries()["contamination_check"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan and "BroadcastExchange" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3


def test_dv_free_store_read_plan_unchanged(spark, tmp_path):
    """The deletion-vector seam must cost NOTHING when a table has no
    DVs: the snapshot read is a bare scan-union (no join, no metadata
    columns). With DVs it becomes exactly one BROADCAST anti-join, and
    predicate pushdown still reaches the data scan through it."""
    from pyspark.sql import functions as F

    from pyairbyte_spark.writers import CommitLogTableStore

    store = CommitLogTableStore(spark, str(tmp_path / "wh"), "main")
    df = (
        spark.range(0, 400)
        .withColumn("k", F.col("id") % 10)
        .repartitionByRange(4, "k")
    )
    store.write_append(df, "t")
    clean = plan_str(store.read("t"), "simple")
    assert "Join" not in clean and "_metadata" not in clean

    store.delete_where("t", [("k", "=", 3)], mode="mor")
    withdv = store.read("t").filter("k = 6").select("id")
    plan = plan_str(withdv, "simple")
    assert "LeftAnti, BuildRight" in plan, plan
    assert plans.has_broadcast_join(withdv)
    assert any("EqualTo(k,6)" in p for p in plans.pushed_filters(withdv)), (
        plans.pushed_filters(withdv)
    )


def test_hll_keyed_aggs_no_join(spark):
    """HLL sketch = keyed hash aggregations only: no join anywhere, at
    most 3 hash exchanges (distinct rewrite + register agg + final),
    each fed by a map-side partial HashAggregate."""
    df = q.queries()["approx_distinct_hll"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    assert "Join" not in plan and "Cartesian" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_cms_sketch_plan_bounded(spark):
    """CMS folds from the exact vocabulary (r15 §11): the ONE
    corpus-volume exchange is the (token, freq) groupBy with map-side
    combine; the sketch groupBy, the top-10 sort and the estimate
    joins all ride vocab- or 2x1024-bounded frames (the vocab subtree
    repeats per consumer branch, so the hashpartitioning COUNT is
    higher than the old stream-fold plan while every added exchange
    is small); no cartesian blowup."""
    df = q.queries()["cms_token_frequency"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 5, plan


def test_sampled_quantiles_one_scan_one_shuffle(spark):
    """The md5-keyed sample is a post-scan filter (not pushable — a
    function of the column) feeding ONE keyed aggregation; the whole
    estimator is a single scan + single shuffle."""
    df = q.queries()["events_value_quantiles_sampled"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_histogram_quantiles_one_scan(spark):
    """Histogram sketch: one scan into 256-bin counts; the cumulative
    window and quantile table ride two keyed exchanges; the quantile
    join is a 3-row broadcast (the BNLJ is the build side of size 3)."""
    df = q.queries()["events_histogram_quantiles"](spark, SF_DIR)
    plan = plan_str(df, "simple")
    assert plan.count("FileScan parquet") == 1
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_hll_registers_sparse_at_low_fill(spark):
    """The register frame is OCCUPIED-ONLY (sparse): at low fill the
    materialized/shuffled rows are O(distinct registers), not
    O(groups x 2^p) — the property that makes wide-profile
    (1000s of columns x groups) sketching affordable at large p."""
    from pyairbyte_spark.operators import sketches as sk

    df = (
        spark.range(0, 3000)
        .selectExpr("id % 1000 AS g", "CAST(id % 3 AS STRING) AS v")
    )
    regs = sk.hll_registers(df, group_cols=["g"], value="v", p=14)
    n = regs.count()
    assert n <= 3000  # <= groups x distinct, nowhere near 1000 x 16384
    # and the estimates are exact in the linear-counting regime
    est = sk.hll_estimate(regs, group_cols=["g"], p=14)
    assert est.filter("approx_distinct != 3").count() == 0
    # plan: keyed aggregations only, no join, no dense generator
    plan = est._jdf.queryExecution().simpleString()
    assert "Join" not in plan and "Generate" not in plan


def test_explain_str_connect_fallback(spark):
    """Without a _jdf (Spark Connect), explain_str captures the
    printed explain output — every helper built on it keeps working.
    (grpcio is absent in this sandbox, so a real Connect session
    can't start; the shim reproduces the Connect DataFrame surface:
    no _jdf, print-only explain().)"""
    df = q.t(spark, SF_DIR, "orders").filter("o_orderkey < 10").select(
        "o_orderkey", "o_totalprice"
    )

    class ConnectLike:
        """df.explain() prints; no _jdf attribute."""

        def __init__(self, inner):
            self._inner = inner

        def explain(self, mode="formatted"):
            self._inner.explain(mode=mode)

    shim = ConnectLike(df)
    out = plans.explain_str(shim, "formatted")
    assert "PushedFilters" in out and "ReadSchema" in out
    assert plans.pushed_filters(shim)
    assert plans.scan_columns(shim)
    assert plans.shuffle_count(shim) == 0
    assert not plans.has_unpartitioned_window(shim)
    # and the fallback text agrees with the classic JVM path
    assert plans.pushed_filters(shim) == plans.pushed_filters(df)
