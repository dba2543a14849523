"""Record-level dataflow: metadata columns, normalization, pruning.

The reference gives every landed record three internal columns
(``airbyte/constants.py:16-40``, ``airbyte/records.py:234-241``):

- ``_airbyte_raw_id``  — UUIDv7 (time-sortable),
- ``_airbyte_extracted_at`` — tz-aware extraction timestamp,
- ``_airbyte_meta`` — JSON metadata dict.

Here those are DataFrame transformations. UUIDv7 has no Spark builtin
(``uuid()`` is v4), so we construct one from
``unix_millis(current_timestamp())`` + random bits with built-in
expressions — stays JVM-side, no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyairbyte_spark.constants import (
    AB_EXTRACTED_AT_COLUMN,
    AB_INTERNAL_COLUMNS,
    AB_META_COLUMN,
    AB_RAW_ID_COLUMN,
)
from pyairbyte_spark.names import LowerCaseNormalizer


def uuid7_expr() -> Column:
    """A UUIDv7-shaped id: 48-bit unix-millis timestamp + random bits.

    Time-sortable like the reference's ``uuid7str()`` raw ids
    (``airbyte/records.py:237``). Built from JVM-side expressions so the
    generation is codegen'd (no Python round-trip per row).
    """
    ts_hex = F.lpad(F.hex(F.unix_millis(F.current_timestamp())), 12, "0")
    # Random bits from two uuid4 calls' hex characters.
    r = F.regexp_replace(F.expr("uuid()"), "-", "")
    return F.concat_ws(
        "-",
        F.substring(ts_hex, 1, 8),
        F.substring(ts_hex, 9, 4),
        F.concat(F.lit("7"), F.substring(r, 1, 3)),
        F.concat(F.lit("8"), F.substring(r, 4, 3)),
        F.substring(r, 7, 12),
    )


def with_metadata_columns(df: DataFrame) -> DataFrame:
    """Append the three internal columns to a batch of records."""
    return (
        df.withColumn(AB_RAW_ID_COLUMN, uuid7_expr())
        .withColumn(AB_EXTRACTED_AT_COLUMN, F.current_timestamp())
        .withColumn(AB_META_COLUMN, F.to_json(F.struct()))
    )


def normalize_column_names(df: DataFrame) -> DataFrame:
    """Rename top-level columns with the LowerCaseNormalizer.

    One rename pass per schema — not per row (contrast with the
    reference's per-record ``StreamRecordHandler.to_index_case``
    memoized dict lookups, ``airbyte/records.py:93-171``).
    """
    norm = LowerCaseNormalizer.normalize
    renamed = [norm(c) if c not in AB_INTERNAL_COLUMNS else c for c in df.columns]
    return df.toDF(*renamed)


def prune_extra_columns(df: DataFrame, declared: list[str]) -> DataFrame:
    """Drop undeclared columns; keep internal metadata columns.

    Parity with ``prune_extra_fields`` (``airbyte/records.py:223-232``)
    and the pre-load drop at ``airbyte/shared/sql_processor.py:906-909``.
    """
    norm = LowerCaseNormalizer.normalize
    keep = {norm(c) for c in declared} | set(AB_INTERNAL_COLUMNS)
    cols = [c for c in df.columns if c in keep or norm(c) in keep]
    return df.select(*cols)


def conform_to_schema(df: DataFrame, declared: list[str]) -> DataFrame:
    """Add missing declared columns as NULLs and order columns stably.

    Missing-column handling matches the reference's bulk-load behavior
    where absent fields land as NULL (``sql_processor.py:887-932``).
    """
    norm = LowerCaseNormalizer.normalize
    have = {norm(c): c for c in df.columns}
    out = []
    for col in declared:
        n = norm(col)
        if n in have:
            out.append(F.col(have[n]).alias(n))
        else:
            out.append(F.lit(None).cast("string").alias(n))
    for col in AB_INTERNAL_COLUMNS:
        if col in df.columns:
            out.append(F.col(col))
    return df.select(*out)
