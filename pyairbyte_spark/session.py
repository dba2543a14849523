"""SparkSession factory tuned for this engine.

Local-mode defaults match the test/bench environment (single JVM,
``local[N]``); at cluster scale the same config keys are what you'd
tune — AQE handles skew/coalesce at runtime, shuffle partitions sized
to cores here and to ~2-3× total cores on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pyairbyte_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE partition coalescing stays at Spark's parallelism-first
        # default. Round 14 flipped this to size-first (parallelismFirst
        # =false, 128m advisory); round 15's within-one-session
        # interleaved A/B (4 alternating rounds per row) measured that
        # flip as the root cause of the two standing "noise-suspect"
        # regressions — it coalesces mid-size aggregation shuffles to a
        # single partition, serializing the reduce stage:
        #   window_topk_parts_per_supplier  2.78s -> 1.85s on revert
        #   dedup_ngram_jaccard             3.64s -> 2.20s on revert
        # while the micro-shuffle rows it was meant to help are within
        # noise (store_merge_evolve 2.88 vs 2.83, txn_atomic 1.89 vs
        # 1.85; text_index_sync_search pays ~6% — the one trade-off).
        # KB-sized shuffles still coalesce to one partition either way
        # (the 1 MB minPartitionSize floor), so clustered micro-appends
        # keep landing a single sorted file. The advisory size remains
        # env-tunable for cluster runs.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "64m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # INT96 (the legacy default) writes NO parquet column stats for
        # timestamps — zone-map skipping and row-group pruning on time
        # columns silently die. MICROS is the modern representation.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
