"""Time-series resampling: fixed-grid rollup with gap filling.

The metrics/training-telemetry primitive Spark lacks as a single verb:
aggregate events onto a fixed time grid (hour/day/...) and EMIT the
empty cells — downstream consumers (anomaly z-scores, moving averages,
forecasting feature frames) are wrong if silent gaps just vanish from
the frame.

Shape at 100 TB: ONE pass over the base data (the keyed rollup
shuffle); everything after operates on the aggregated frame —
per-key bounds, a global [min, max] window over O(keys) rows (the only
single-partition moment, explicitly tiny), a `sequence`/`explode`
spine of O(keys x grid cells) rows, and one left join back to the
rollup on (key, bucket), AQE-planned. No UDFs anywhere; the spine is
JVM `sequence`, so the grid never routes through Python.

Reference analog: none — the reference has no time-bucket semantics at
all (closest is cursor-field incremental sync, `airbyte/sources/base.py`);
this extends the §2.11 beyond-reference analytics surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_UNITS = {"hour", "day", "week", "month"}


def resample_gapfill(
    df: DataFrame,
    *,
    ts_col: str,
    key_cols: list[str],
    unit: str = "hour",
    aggs: list[Column],
    fills: dict[str, Column],
) -> DataFrame:
    """Per-key fixed-grid rollup with explicit empty cells.

    ``aggs`` are named aggregate columns; ``fills`` maps each aggregate
    output name to its gap default (e.g. ``F.lit(0)``). The grid spans
    the GLOBAL [min, max] bucket range so every key carries the same
    spine (the frame shape forecasting consumers want); keys absent
    from the data entirely are (necessarily) absent from the output.

    Output: key_cols + ``__ts_bucket`` (timestamp) + aggregate columns.
    """
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}")
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("__ts_bucket")
    # The rollup feeds both the spine derivation and the final join —
    # checkpoint it (O(keys x grid cells) rows) so the base-data scan
    # and its shuffle run exactly once, not once per consumer.
    rolled = df.groupBy(bucket, *key_cols).agg(*aggs).localCheckpoint(
        eager=False
    )

    # Bounds + spine are derived FROM the rollup: O(keys) rows.
    per_key = rolled.groupBy(*key_cols).agg(
        F.min("__ts_bucket").alias("__klo"),
        F.max("__ts_bucket").alias("__khi"),
    )
    everything = Window.partitionBy()  # O(keys) rows — tiny by contract
    bounded = per_key.select(
        *key_cols,
        F.min("__klo").over(everything).alias("__lo"),
        F.max("__khi").over(everything).alias("__hi"),
    )
    spine = bounded.select(
        *key_cols,
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"interval 1 {unit}"))
        ).alias("__ts_bucket"),
    )
    joined = spine.join(rolled, [*key_cols, "__ts_bucket"], "left")
    filled = [
        F.coalesce(F.col(name), default).alias(name)
        for name, default in fills.items()
    ]
    untouched = [
        c
        for c in rolled.columns
        if c not in fills and c != "__ts_bucket" and c not in key_cols
    ]
    return joined.select(*key_cols, "__ts_bucket", *filled, *untouched)


def fill_forward(
    df: DataFrame,
    *,
    ts_col: str,
    key_cols: list[str],
    value_cols: list[str],
    suffix: str = "_locf",
) -> DataFrame:
    """Last observation carried forward per key: NULL cells take the
    most recent non-null value at-or-before them (the standard
    downsample companion — sensor/metric series where a gap means "no
    change", not "zero"). One window per key ordered by time —
    the same single shuffle shape as the as-of join; leading NULLs
    (no prior observation) stay NULL."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [
        F.last(c, ignorenulls=True).over(w).alias(f"{c}{suffix}")
        for c in value_cols
    ]
    return df.select("*", *carried)
