"""Named warehouse caches (reference ``airbyte.caches`` parity)."""

from __future__ import annotations

import re

from pyairbyte_spark.sources import SourceFaker


def test_top_level_all_matches_reference_surface():
    """Everything the reference exports from ``airbyte`` exists here
    (modules and classes; reference airbyte/__init__.py __all__)."""
    import pyairbyte_spark as p

    ref_all = {
        "cloud", "caches", "callbacks", "cli", "constants", "datasets",
        "destinations", "documents", "exceptions", "experimental",
        "logs", "mcp", "records", "registry", "results", "secrets",
        "sources", "get_available_connectors", "get_colab_cache",
        "get_default_cache", "get_destination", "get_secret",
        "get_source", "new_local_cache", "BigQueryCache",
        "CachedDataset", "Destination", "DuckDBCache", "ReadResult",
        "SecretSourceEnum", "Source", "StreamRecord", "WriteResult",
        "WriteStrategy",
    }
    missing = sorted(x for x in ref_all if not hasattr(p, x))
    assert not missing, missing


def test_duckdb_cache_roundtrip(spark, tmp_path):
    from pyairbyte_spark.caches import DuckDBCache

    db = tmp_path / "mydb.duckdb"
    cache = DuckDBCache(db_path=str(db), schema_name="main", spark=spark)
    SourceFaker(seed=1234, count=50).read(cache, write_strategy="replace")
    assert len(cache["users"]) == 50
    assert cache.db_path == str(db)
    assert cache.connection_config["destination_path"] == str(db)
    assert cache.warehouse_dir.startswith(str(db))


def test_named_cache_constructors(spark, tmp_path, monkeypatch):
    """Reference constructor surfaces port unchanged; each cache roots
    a distinct warehouse and carries its connection fields."""
    monkeypatch.chdir(tmp_path)
    from pyairbyte_spark.caches import (
        BigQueryCache,
        CacheBase,
        MotherDuckCache,
        PostgresCache,
        SnowflakeCache,
    )
    from pyairbyte_spark.cache import SparkCache

    assert CacheBase is SparkCache
    cases = [
        (
            BigQueryCache(
                project_name="proj", dataset_name="ds", spark=spark
            ),
            "bigquery",
        ),
        (
            PostgresCache(
                host="h", database="db", username="u", password="p", spark=spark
            ),
            "postgres",
        ),
        (
            SnowflakeCache(
                account="acct", database="db", warehouse="wh", spark=spark
            ),
            "snowflake",
        ),
        (MotherDuckCache(database="md_db", api_key="k", spark=spark), "motherduck"),
    ]
    roots = set()
    for cache, ctype in cases:
        assert isinstance(cache, SparkCache)
        assert cache.connection_config["type"] == ctype
        roots.add(cache.warehouse_dir)
        # Warehouse dirs never contain raw path separators from config.
        assert not re.search(r"[:]", cache.warehouse_dir)
    assert len(roots) == len(cases)  # distinct warehouses


def test_caches_submodule_layout():
    """Reference exposes per-warehouse submodules; ours mirror them."""
    from pyairbyte_spark import caches

    for name in ("base", "bigquery", "duckdb", "motherduck", "postgres",
                 "snowflake", "util"):
        assert hasattr(caches, name), name


def test_cache_surfaces_round7_store_verbs(spark, tmp_path):
    """The cache-level passthroughs for MoR delete, MERGE INTO,
    OPTIMIZE, ADD COLUMN, preimage CDF, and timed vacuum."""
    from pyspark.sql import functions as F

    from pyairbyte_spark import SparkCache

    from pyairbyte_spark.strategies import WriteMethod

    cache = SparkCache(spark, str(tmp_path), table_format="commitlog")
    df = (
        spark.range(0, 100)
        .withColumn("v", F.col("id"))
        .withColumn("_airbyte_raw_id", F.concat(F.lit("a"), F.col("id")))
        .withColumn(
            "_airbyte_extracted_at",
            F.lit("2026-01-01 00:00:00").cast("timestamp"),
        )
    )
    cache.write_dataframe(df, "s", WriteMethod.MERGE, ["id"])
    assert cache.delete_stream_where("s", [("id", "<", 10)], mode="mor") == {
        "deleted_rows": 10,
        "files_rewritten": 0,
        "version": 2,
    }
    assert len(cache["s"]) == 90
    cache.add_stream_column("s", "score", "double", default=2.0)
    src = spark.createDataFrame([(50,), (500,)], ["id"]).withColumn(
        "score", F.lit(9.0)
    )
    res = cache.merge_stream_into(
        "s",
        src,
        ["id"],
        when_matched_update={"score": "s.score"},
        when_not_matched_insert=True,
    )
    assert res["updated"] == 1 and res["inserted"] == 1
    feed = cache.read_stream_changes("s", 3, 4, include_preimages=True)
    assert "update_preimage" in {
        r["_change_type"] for r in feed.collect()
    }
    for i in range(2):  # a small-file append tail to pack
        cache.write_dataframe(
            spark.range(1000 + i, 1001 + i)
            .withColumn("v", F.col("id"))
            .withColumn("score", F.lit(0.0))
            .withColumn("_airbyte_raw_id", F.concat(F.lit("t"), F.col("id")))
            .withColumn(
                "_airbyte_extracted_at",
                F.lit("2026-01-02 00:00:00").cast("timestamp"),
            ),
            "s",
        )
    opt = cache.optimize_stream("s", small_file_bytes=1 << 20)
    assert opt["optimized"]
    removed = cache.vacuum("s", keep_commits=1, keep_hours=-1)
    assert isinstance(removed, list)
    got = cache["s"].to_spark()
    assert got.count() == 93  # 100 - 10 + merge-insert + 2 tail rows
    assert got.filter("score = 9.0").count() == 2
