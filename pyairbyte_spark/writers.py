"""Table store + write-strategy execution (append / replace / merge).

The reference finalizes each stream's temp table into the final table
with one of three SQL shapes (``airbyte/shared/sql_processor.py``):

- APPEND  → ``INSERT INTO … SELECT`` (:1042-1059)
- REPLACE → temp-table + atomic-ish rename swap (:1061-1087)
- MERGE   → native ``MERGE INTO`` (:1089-1127) or the emulated
  update-join + left-anti insert (:1148-1208)

Spark-first design:

- Tables are partitioned parquet directories (Delta would make
  REPLACE/MERGE single-commit atomic; parquet needs the same
  temp-then-swap dance the reference does, implemented here).
- MERGE is the ``row_number() OVER (PARTITION BY pk ORDER BY
  _airbyte_extracted_at DESC, _airbyte_raw_id DESC) = 1`` dedup-union —
  this also dedups *within* the incoming batch, fixing the reference's
  known same-batch-dupe TODO (``sql_processor.py:763-765``).
- At 100 TB: the union-dedup merge shuffles once on the PK; the window
  and the final write reuse that hash partitioning (no second shuffle).
  For very large dimension-style tables you'd switch the store to Delta
  and let MERGE INTO rewrite only matched files; the strategy layer here
  is the seam where that swaps in.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyairbyte_spark.constants import AB_EXTRACTED_AT_COLUMN, AB_RAW_ID_COLUMN
from pyairbyte_spark.strategies import WriteMethod


class TableStore:
    """Parquet-directory table store with swap-based atomicity."""

    def __init__(self, spark: SparkSession, warehouse_dir: str, schema_name: str) -> None:
        self.spark = spark
        self.root = os.path.join(warehouse_dir, schema_name)
        os.makedirs(self.root, exist_ok=True)

    def table_path(self, table_name: str) -> str:
        return os.path.join(self.root, table_name)

    def table_exists(self, table_name: str) -> bool:
        path = self.table_path(table_name)
        return os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        )

    def read(self, table_name: str) -> DataFrame:
        # mergeSchema handles auto-added columns across appends
        # (schema evolution parity with sql_processor.py:934-981).
        return self.spark.read.option("mergeSchema", "true").parquet(
            self.table_path(table_name)
        )

    def list_tables(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d)) and not d.startswith("_tmp_")
        )

    def drop(self, table_name: str) -> None:
        shutil.rmtree(self.table_path(table_name), ignore_errors=True)

    # -- write strategies ---------------------------------------------------

    def _temp_name(self, table_name: str) -> str:
        # ULID-suffixed unique temp names (parity: sql_processor.py:592-612).
        return f"_tmp_{table_name}_{uuid.uuid4().hex[:9]}"

    def _swap_in(self, temp_name: str, table_name: str) -> None:
        """rename final→deleteme, temp→final, drop deleteme
        (parity: sql_processor.py:1061-1087)."""
        final = self.table_path(table_name)
        temp = self.table_path(temp_name)
        deleteme = self.table_path(f"_tmp_deleteme_{uuid.uuid4().hex[:9]}")
        if os.path.isdir(final):
            os.replace(final, deleteme)
        os.replace(temp, final)
        shutil.rmtree(deleteme, ignore_errors=True)

    def write_append(self, df: DataFrame, table_name: str) -> None:
        if self.table_exists(table_name):
            # Align by name against the existing table's schema; new
            # columns flow through (mergeSchema on read).
            existing_cols = set(self.read(table_name).columns)
            new_cols = [c for c in df.columns if c not in existing_cols]
            ordered = [c for c in df.columns if c in existing_cols] + new_cols
            df = df.select(*ordered)
        df.write.mode("append").parquet(self.table_path(table_name))

    def write_replace(self, df: DataFrame, table_name: str) -> None:
        temp = self._temp_name(table_name)
        df.write.mode("overwrite").parquet(self.table_path(temp))
        self._swap_in(temp, table_name)

    def write_merge(self, df: DataFrame, table_name: str, primary_keys: list[str]) -> None:
        if not primary_keys:
            raise ValueError("merge requires primary keys")
        incoming = df
        if self.table_exists(table_name):
            old = self.read(table_name)
            incoming = old.unionByName(incoming, allowMissingColumns=True)
        # One shuffle on the PK; window + dedup ride the same partitioning.
        w = Window.partitionBy(*primary_keys).orderBy(
            F.col(AB_EXTRACTED_AT_COLUMN).desc_nulls_last(),
            F.col(AB_RAW_ID_COLUMN).desc_nulls_last(),
        )
        latest = (
            incoming.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        temp = self._temp_name(table_name)
        latest.write.mode("overwrite").parquet(self.table_path(temp))
        self._swap_in(temp, table_name)

    def write(
        self,
        df: DataFrame,
        table_name: str,
        method: WriteMethod,
        primary_keys: list[str] | None = None,
    ) -> None:
        if method == WriteMethod.APPEND:
            self.write_append(df, table_name)
        elif method == WriteMethod.REPLACE:
            self.write_replace(df, table_name)
        elif method == WriteMethod.MERGE:
            self.write_merge(df, table_name, primary_keys or [])
        else:  # pragma: no cover
            raise ValueError(f"unknown write method {method}")
