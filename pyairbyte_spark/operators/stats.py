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
