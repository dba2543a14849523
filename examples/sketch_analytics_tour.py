"""Sketch-based analytics tour: approximate answers with exact plumbing.

The operations a 100 TB deployment answers with SKETCHES instead of
scans, end-to-end on a commit-log table:

1. sync data into an ACID cache (two appends),
2. ANALYZE per-column NDV once, then serve distinct-count estimates
   with NO data I/O — catching up from the change feed after appends,
3. HyperLogLog distinct + pairwise overlap (set algebra on registers),
4. count-min sketch frequency estimates for heavy hitters,
5. gap-filled hourly resample + forward fill over an event series.

Everything here is deterministic: the same inputs give the same
estimates on any cluster, any partitioning, any run — the property
that makes approximate analytics debuggable (and lets this repo's
DuckDB oracles verify the estimates value-for-value).

Run: ``python examples/sketch_analytics_tour.py``
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from pyairbyte_spark import SparkCache, get_spark  # noqa: E402
from pyairbyte_spark.operators.sketches import (  # noqa: E402
    cms_counts,
    cms_point_estimate,
    hll_distinct,
    hll_pairwise_overlap,
)
from pyairbyte_spark.operators.timeseries import (  # noqa: E402
    fill_forward,
    resample_gapfill,
)
from pyairbyte_spark.sources import SourceFaker  # noqa: E402


def main() -> None:
    spark = get_spark("sketch-tour")
    cache = SparkCache(
        spark, tempfile.mkdtemp(prefix="sketch-tour-"),
        table_format="commitlog",
    )

    # 1. Two appends — the second lands AFTER the ANALYZE below.
    SourceFaker(seed=1, count=400).read(cache, write_strategy="append")

    # 2. ANALYZE once; estimates then serve from the stats sidecar.
    cache.analyze_stream_ndv("users", ["id", "age"])
    SourceFaker(seed=2, count=600).read(cache, write_strategy="append")
    ndv = cache.stream_approx_distinct("users")  # change-feed catch-up
    print(f"NDV (no scan): {ndv}")

    users = cache["users"].to_spark()

    # 3. HLL distinct + overlap between derived cohorts.
    per_decade = hll_distinct(
        users.withColumn("decade", (F.col("age") / 10).cast("int") * 10),
        group_cols=["decade"], value="id", p=8, include_exact=True,
    )
    print("distinct users per age decade (exact vs sketch):")
    per_decade.orderBy("decade").show(12, truncate=False)

    overlap = hll_pairwise_overlap(
        users.withColumn(
            "cohort",
            F.when(F.col("age") < 40, "young").otherwise("older"),
        ),
        type_col="cohort", value="id", p=8,
    )
    print("cohort overlap by sketch set-algebra:")
    overlap.show(truncate=False)

    # 4. CMS heavy hitters over a token stream.
    toks = users.select(
        F.explode(F.split(F.lower("address"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    cms = cms_counts(toks, value="tok")
    top = (
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "tok").limit(8)
    )
    print("top address tokens, exact vs CMS estimate (est >= exact):")
    cms_point_estimate(top, cms, value="tok").orderBy(
        F.desc("freq")
    ).show(truncate=False)

    # 5. Resample + LOCF over a synthetic event series with gaps.
    events = spark.createDataFrame(
        [("m1", f"2024-01-01 {h:02d}:30:00", float(v))
         for h, v in [(0, 10), (1, 12), (4, 9), (7, 14)]],
        "series string, ts string, v double",
    ).select("series", F.to_timestamp("ts").alias("ts"), "v")
    grid = resample_gapfill(
        events, ts_col="ts", key_cols=["series"], unit="hour",
        aggs=[F.count(F.lit(1)).alias("n"), F.avg("v").alias("avg_v")],
        fills={"n": F.lit(0).cast("long")},
    )
    print("gap-filled hourly grid with forward-filled averages:")
    fill_forward(
        grid, ts_col="__ts_bucket", key_cols=["series"],
        value_cols=["avg_v"],
    ).orderBy("__ts_bucket").show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
