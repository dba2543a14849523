"""As-of and range joins — operators Spark lacks natively.

**As-of join** (`asof_join`): for each left row, the most recent right
row with ``right.ts <= left.ts`` per key. Spark-first formulation: no
join at all — union both sides tagged, one window per key ordered by
(ts, side) carrying the last right-row id forward (``last(...,
ignorenulls=True)``). One shuffle on the key; state per partition is a
single running value. This beats the naive inequality-join (O(n·m) BNLJ)
and matches DuckDB's native ``ASOF JOIN`` semantics (ties: a right row
at exactly left.ts matches).

At 100 TB: the union-window form shuffles each side once on the key and
streams in ts order — the same shape a merge-asof would take; skewed
keys are AQE-split. For unkeyed/range-banded variants, bucketize the
time axis and window within buckets.

**Range join** (`range_join_buckets`): left value ∈ [lo, hi) buckets —
a broadcast nested-loop against a small bounds table (the common shape);
for large bounds tables, bucketize both sides on a step grid and
equi-join the grid key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows enriched with the latest right row at-or-before ts.

    Output = left columns + ``{right_value_col}{suffix}`` columns
    (NULL when no prior right row exists).
    """
    lcols = left.columns
    l = left.select(
        *lcols, F.lit(1).alias("__side")
    )
    r = right.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols],
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True)
            .over(w)
            .alias(f"__filled_{c}")
            for c in right_value_cols
        ],
    )
    return (
        filled.filter(F.col("__side") == 1)
        .select(
            *lcols,
            *[
                F.col(f"__filled_{c}").alias(f"{c}{suffix}")
                for c in right_value_cols
            ],
        )
    )


def range_join_buckets(
    fact: DataFrame,
    buckets: DataFrame,
    *,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """fact rows matched to the bucket where lo <= value < hi.

    The bounds table is broadcast (it is small by construction);
    Catalyst executes a BroadcastNestedLoopJoin — per-row bucket lookup
    without shuffling the fact side.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fact.join(F.broadcast(buckets), cond, "left")
