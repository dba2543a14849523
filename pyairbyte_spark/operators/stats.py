"""Table statistics operators.

Parity with the reference's single-pass multi-aggregate stats
(``airbyte/shared/sql_processor.py:1274-1330`` null counts;
``:87-122,1332-1394`` TableStatistics/ColumnStatistics models).

One ``agg`` job per table — Spark executes all counters in a single
scan with partial (map-side) aggregation.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ColumnStatistics:
    column_name: str
    total_count: int
    non_null_count: int
    null_count: int


@dataclass
class TableStatistics:
    table_name: str
    row_count: int
    columns: list[ColumnStatistics]


def null_stats(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-form (column_name, total_count, non_null_count, null_count)
    in ONE pass over the data."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        F.count(F.col(c)).alias(f"__nn_{i}") for i, c in enumerate(cols)
    ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{i}" for i, c in enumerate(cols)
    )
    return wide.selectExpr(
        "__total",
        f"stack({len(cols)}, {stack_args}) as (column_name, non_null_count)",
    ).select(
        "column_name",
        F.col("__total").alias("total_count"),
        "non_null_count",
        (F.col("__total") - F.col("non_null_count")).alias("null_count"),
    )


def fetch_table_statistics(df: DataFrame, table_name: str) -> TableStatistics:
    rows = null_stats(df).collect()
    total = rows[0]["total_count"] if rows else 0
    return TableStatistics(
        table_name=table_name,
        row_count=total,
        columns=[
            ColumnStatistics(
                column_name=r["column_name"],
                total_count=r["total_count"],
                non_null_count=r["non_null_count"],
                null_count=r["null_count"],
            )
            for r in rows
        ],
    )


def fetch_row_count(df: DataFrame) -> int:
    """Parity: ``fetch_row_count`` (sql_processor.py:1222-1238)."""
    return df.count()


def profile_columns(
    df: DataFrame, columns: list[str], *, p: int = 8
) -> DataFrame:
    """One-shot column profile: (column, n_rows, n_nulls,
    approx_distinct, min_str, max_str) per requested column — the
    Deequ-style table profile a curation pipeline runs before
    training. Two passes regardless of column count: ONE typed
    aggregation row (counts + typed min/max, stacked to long form
    JVM-side) and ONE stacked-column register pass for the HLL
    distinct estimates (`operators/sketches.py` — mergeable, 2^p
    state per column). min/max compare in the column's own type and
    render as strings only for the uniform output schema.

    Reference analog: `fetch_table_statistics`
    (airbyte/shared/sql_processor.py) stops at row counts; the profile
    is part of the beyond-reference analytics surface.
    """
    from pyspark.sql import functions as F

    from pyairbyte_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__nn_{c}`, `__mn_{c}`, `__mx_{c}`" for c in columns
    )
    exact = one.selectExpr(
        "n_rows",
        f"stack({len(columns)}, {stack_args}) AS "
        "(column, n_nonnull, min_str, max_str)",
    )
    stacked = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column"),
                            F.col(c).cast("string").alias("__v"),
                        )
                        for c in columns
                    ]
                )
            ).alias("cv")
        )
        .select("cv.column", "cv.__v")
        .filter(F.col("__v").isNotNull())
    )
    est = hll_estimate(
        hll_registers(stacked, group_cols=["column"], value="__v", p=p),
        group_cols=["column"],
        p=p,
    )
    return exact.join(est, "column", "left").select(
        "column",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("n_rows") - F.col("n_nonnull")).cast("long").alias("n_nulls"),
        F.coalesce(F.col("approx_distinct"), F.lit(0))
        .cast("long")
        .alias("approx_distinct"),
        "min_str",
        "max_str",
    )
