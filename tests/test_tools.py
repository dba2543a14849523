"""Local tool surface (MCP-shaped callables, reference mcp/local.py)."""

from __future__ import annotations

import pytest

from pyairbyte_spark import SparkCache, tools
from pyairbyte_spark.sources import SourceFaker
from pyairbyte_spark.sql_guard import UnsafeSQLError


@pytest.fixture()
def cache(spark, tmp_path):
    return SparkCache(spark, str(tmp_path))


def test_tool_flow(spark, cache):
    src = SourceFaker(seed=1234, count=20)
    assert tools.validate_source(src)["success"]
    streams = tools.list_source_streams(src)
    assert set(streams) == {"users", "products", "purchases"}
    schema = tools.get_stream_json_schema(src, "users")
    assert "id" in schema["properties"]
    recs = tools.read_stream_records(src, "users", limit=3)
    assert len(recs) == 3
    previews = tools.get_stream_previews(src, ["users"], limit=2)
    assert len(previews["users"]) == 2
    counts = tools.sync_source_to_cache(src, cache)
    assert counts["users"] == 20
    listed = tools.list_cached_streams(cache)
    assert {d["stream_name"] for d in listed} >= {"users"}
    desc = tools.describe_cache(cache)
    assert desc["cache_type"] == "SparkCache" and "users" in desc["streams"]
    rows = tools.run_sql_query(cache, "SELECT count(*) AS n FROM users")
    assert rows == [{"n": 20}]
    with pytest.raises(UnsafeSQLError):
        tools.run_sql_query(cache, "DROP TABLE users")


def test_sql_guard_literals_and_explain():
    """Quote-aware guard: comment/separator chars inside string
    literals are data; the ORIGINAL text (literals intact) is what
    executes. EXPLAIN/DESCRIBE/SHOW get the same forbidden-verb scan
    as everything else; SHOW CREATE TABLE stays allowed."""
    from pyairbyte_spark.sql_guard import guard_sql, is_safe_sql

    # Literals containing -- ; /* must survive verbatim.
    q = "SELECT '--not a comment' AS a, 'x;y' AS b, '/*c*/' AS c"
    assert guard_sql(q) == q
    assert guard_sql(q + " ;") == q
    # Real second statement still rejected.
    assert not is_safe_sql("SELECT 1; SELECT 2")
    # EXPLAIN of a write is rejected, not analyzed.
    assert not is_safe_sql("EXPLAIN DROP TABLE t")
    assert not is_safe_sql("EXPLAIN INSERT INTO t VALUES (1)")
    assert is_safe_sql("EXPLAIN SELECT * FROM t")
    assert is_safe_sql("DESCRIBE t")
    assert is_safe_sql("SHOW TABLES")
    assert is_safe_sql("SHOW CREATE TABLE t")
    # Comment hiding a write verb is still caught after stripping.
    assert not is_safe_sql("SELECT 1 /* x */; DROP TABLE t")


def test_near_dup_and_span_tools(spark, tmp_path):
    cache = SparkCache(
        spark, str(tmp_path / "ndwh"), table_format="commitlog"
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "pack my box with five dozen liquor jugs right now"),
            (3, "the quick brown fox jumps over the lazy dog tonight ok"),
        ],
        ["doc_id", "text"],
    )
    cache.write_dataframe(docs, "docs")
    # no index yet: falls back to the full LSH pass
    hits = tools.find_near_duplicates(
        cache, "docs", "the quick brown fox jumps over the lazy dog tonight"
    )
    assert {h["match_id"] for h in hits} >= {1}
    # with a persisted index: probed path, signature agreement filled
    from pyairbyte_spark.operators.dedup import build_minhash_index

    build_minhash_index(docs, cache.store, "mh")
    hits2 = tools.find_near_duplicates(
        cache, "docs", "the quick brown fox jumps over the lazy dog tonight"
    )
    assert any(h["match_id"] == 1 and h["n_agree"] == 12 for h in hits2)
    spans = tools.scan_duplicate_spans(cache, "docs", n=8, limit=5)
    assert {s["doc_id"] for s in spans} == {1, 3}
    assert all(s["n_removed"] >= 8 for s in spans)


def test_dedup_index_health_and_refresh_tools(spark, tmp_path):
    from pyspark.sql import functions as F

    cache = SparkCache(
        spark, str(tmp_path / "dihwh"), table_format="commitlog"
    )
    docs = spark.range(0, 60).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.md5((F.col("id") * p + 1).cast("string")) for p in (3, 7, 11, 13)],
        ).alias("text"),
    )
    from pyairbyte_spark.operators.dedup import (
        append_to_minhash_index,
        build_minhash_index,
    )

    build_minhash_index(docs, cache.store, "mh", target_files=2)
    h = tools.get_dedup_index_health(cache)
    assert h["healthy"] and h["coverage"] == 1.0
    # clear write-time clustering (builds set it since round 12) to
    # exercise the decay/refresh lifecycle these tools surface
    cache.store.set_cluster_by("mh_bands", None)
    append_to_minhash_index(
        spark.range(100, 130).select(
            F.col("id").alias("doc_id"),
            F.md5(F.col("id").cast("string")).alias("text"),
        ),
        cache.store,
        "mh",
    )
    assert tools.get_dedup_index_health(cache)["files_unclustered"] > 0
    # probe wrapper surfaces the coverage watermark
    wrapped = tools.find_near_duplicates(
        cache, "unused", "some probe text here", include_index_state=True
    )
    assert wrapped["index"]["files_unclustered"] > 0
    r = tools.refresh_dedup_index(cache)
    assert r["refreshed"] and r["coverage"] == 1.0
    assert "unclustered_entries" not in r
