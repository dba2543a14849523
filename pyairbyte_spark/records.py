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


def uuid7_expr(seq: Column | None = None) -> Column:
    """A UUIDv7-shaped id: 48-bit unix-millis timestamp, then either an
    arrival-sequence counter or random bits.

    Time-sortable like the reference's ``uuid7str()`` raw ids
    (``airbyte/records.py:237``). When ``seq`` is given, its 48 bits
    occupy the most-significant post-timestamp positions (the v7
    monotonic-counter variant), so ids from one batch sort in arrival
    order — that's what makes merge's latest-per-PK deterministic even
    for duplicates inside a single batch. Built from JVM-side
    expressions so the generation is codegen'd (no Python per row).
    """
    ts_hex = F.lpad(F.hex(F.unix_millis(F.current_timestamp())), 12, "0")
    r = F.regexp_replace(F.expr("uuid()"), "-", "")
    if seq is None:
        mid, tail = F.substring(r, 1, 6), F.substring(r, 7, 12)
    else:
        seq_hex = F.lpad(F.hex(seq), 12, "0")
        mid = F.substring(seq_hex, 1, 6)
        tail = F.concat(F.substring(seq_hex, 7, 6), F.substring(r, 1, 6))
    return F.concat_ws(
        "-",
        F.substring(ts_hex, 1, 8),
        F.substring(ts_hex, 9, 4),
        F.concat(F.lit("7"), F.substring(mid, 1, 3)),
        F.concat(F.lit("8"), F.substring(mid, 4, 3)),
        tail,
    )


def with_metadata_columns(df: DataFrame, *, seq_col: str | None = None) -> DataFrame:
    """Append the three internal columns to a batch of records.

    ``seq_col`` names an arrival-sequence column (added by the staging
    writer) to fold into the raw id; it is consumed here.
    """
    seq = F.col(seq_col) if seq_col and seq_col in df.columns else None
    out = (
        df.withColumn(AB_RAW_ID_COLUMN, uuid7_expr(seq))
        .withColumn(AB_EXTRACTED_AT_COLUMN, F.current_timestamp())
        .withColumn(AB_META_COLUMN, F.to_json(F.struct()))
    )
    return out.drop(seq_col) if seq is not None else out


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


class StreamRecord(dict):
    """Case-aware, case-insensitive record dict (reference
    ``records.py:174``): lookups, deletes and membership checks resolve
    through the lower-case normalizer while the display case of keys is
    preserved; ``expected_keys`` pre-seeds missing properties with None
    (and fixes their display case), mirroring how a case-insensitive
    SQL engine resolves column references.
    """

    def __init__(
        self,
        from_dict: dict | None = None,
        *,
        expected_keys: list[str] | None = None,
    ) -> None:
        super().__init__()
        self._display: dict[str, str] = {}
        for key in expected_keys or []:
            self[key] = None
        for key, value in (from_dict or {}).items():
            self[key] = value

    @staticmethod
    def _norm(key: str) -> str:
        from pyairbyte_spark.names import LowerCaseNormalizer

        return LowerCaseNormalizer.normalize(str(key))

    def __setitem__(self, key: str, value) -> None:
        norm = self._norm(key)
        if norm in self._display:
            # Existing property: keep its established display case.
            super().__setitem__(self._display[norm], value)
        else:
            self._display[norm] = key
            super().__setitem__(key, value)

    def __getitem__(self, key: str):
        return super().__getitem__(self._display[self._norm(key)])

    def __delitem__(self, key: str) -> None:
        norm = self._norm(key)
        display = self._display.pop(norm)
        super().__delitem__(display)

    def __contains__(self, key) -> bool:
        try:
            return self._norm(key) in self._display
        except Exception:  # noqa: BLE001 - non-string keys are never present
            return False

    def get(self, key, default=None):
        return self[key] if key in self else default
