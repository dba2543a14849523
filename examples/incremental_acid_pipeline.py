#!/usr/bin/env python
"""Incremental lakehouse pipeline on the commit-log (ACID) store.

Demonstrates the round-4 table-format layer end to end:

1. ingest with write-time CHECK expectations (rejects quarantined)
2. upsert a correction batch (file-pruned incremental merge)
3. inspect the change data feed between commits
4. follow the feed into a downstream "clean" table (incremental hop;
   only the delta moves)
5. OPTIMIZE-style clustered compaction, then a data-skipping read
   that proves files were pruned
6. time travel back to the pre-correction snapshot

Run: python examples/incremental_acid_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from pyairbyte_spark import get_spark
from pyairbyte_spark.cache import SparkCache
from pyairbyte_spark.strategies import WriteMethod
from pyairbyte_spark.streaming import ChangeFeedFollower


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("acid-pipeline")
    cache = SparkCache(
        spark,
        warehouse_dir=tempfile.mkdtemp(prefix="acid-ex-"),
        table_format="commitlog",
        merge_buckets=8,
    )

    # 1. ingest orders with expectations; bad rows -> orders_quarantine
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("_airbyte_raw_id", F.col("o_orderkey").cast("string"))
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
    )
    counts = cache.write_dataframe(
        orders,
        "orders",
        WriteMethod.MERGE,
        ["o_orderkey"],
        expectations={
            "pk_not_null": "o_orderkey IS NOT NULL",
            "positive_total": "o_totalprice > 0",
        },
        on_violation="quarantine",
    )
    print("ingest violations:", counts)

    # 2. a correction batch: reprice two orders (incremental merge —
    # only the 2 touched buckets restage, the rest of the table is
    # untouched bytes)
    fix = (
        orders.limit(2)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("_airbyte_raw_id", F.concat(F.lit("fix-"), F.col("_airbyte_raw_id")))
    )
    cache.write_dataframe(fix, "orders", WriteMethod.MERGE, ["o_orderkey"])
    print("history:", [(h["version"], h["op"]) for h in cache.table_history("orders")])

    # 3. the change feed names exactly the two repriced rows
    feed = cache.read_stream_changes("orders", from_version=1)
    print("changes:", feed.groupBy("_change_type").count().collect())

    # 4. incremental hop: follow the feed into a slim "clean" table
    follower = ChangeFeedFollower(
        cache,
        "orders",
        cache,
        "orders_clean",
        transform=lambda ch: ch.filter(F.col("_change_type") != "delete")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            "_airbyte_raw_id",
            "_airbyte_extracted_at",
        ),
        primary_keys=["o_orderkey"],
    )
    print("hop1:", follower.process_once())  # full bootstrap
    print("hop2:", follower.process_once())  # caught up -> rows=0

    # 5. cluster + data-skipping read
    print(
        "compact:",
        cache.compact("orders_clean", sort_by=["o_orderkey"], target_files=16),
    )
    store = cache._acid_store()
    tname = cache.table_name("orders_clean")
    hi = store.read(tname).agg(F.max("o_orderkey")).collect()[0][0]
    plan = store.plan_scan(tname, [("o_orderkey", ">", int(hi * 0.9))])
    print(f"skipping: read {plan['files_selected']}/{plan['files_total']} files")
    top = cache.read_stream_where("orders_clean", [("o_orderkey", ">", int(hi * 0.9))])
    print("rows past 90th-pct key:", top.count())

    # 6. GDPR-style DML: forget one customer, reprice a band — each
    # rewrites only the files whose zone maps admit a match
    victim = orders.select("o_custkey").first()[0]
    print("delete:", cache.delete_stream_where("orders", [("o_custkey", "=", victim)]))
    cheap = cache.get_dataset("orders").to_spark().approxQuantile(
        "o_totalprice", [0.1], 0.01
    )[0]
    print(
        "update:",
        cache.update_stream_where(
            "orders",
            [("o_totalprice", "<", cheap)],
            {"o_orderpriority": "'5-LOW'"},
        ),
    )
    feed2 = cache.read_stream_changes("orders", from_version=2)
    print("dml feed:", feed2.groupBy("_change_type").count().collect())

    # 7. time travel: version 1 still shows pre-correction prices
    v1 = cache.read_stream_version("orders", 1)
    cur = cache.get_dataset("orders").to_spark()
    print(
        "repriced rows vs v1:",
        cur.alias("c")
        .join(v1.alias("o"), "o_orderkey")
        .filter(F.col("c.o_totalprice") != F.col("o.o_totalprice"))
        .count(),
    )


if __name__ == "__main__":
    main()
