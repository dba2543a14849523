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

import contextlib
import json
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyairbyte_spark.constants import AB_EXTRACTED_AT_COLUMN, AB_RAW_ID_COLUMN
from pyairbyte_spark.strategies import WriteMethod


BUCKET_COL = "__pk_bucket"


class TableStore:
    """Parquet-directory table store with swap-based atomicity.

    ``merge_buckets=N`` opts a store into bucket-partitioned tables:
    rows partition by ``pmod(xxhash64(pk), N)`` and MERGE rewrites ONLY
    the partitions containing incoming keys (partition-pruned read +
    dynamic partition overwrite) instead of the whole table — the
    parquet expression of Delta's file-pruned ``MERGE INTO``. At 100 TB
    an incremental sync touching 0.1% of keys rewrites ~0.1% of
    buckets, not the table. Bucket atomicity is per-partition (a crash
    mid-merge can leave some buckets new / some old; re-running the
    same merge converges — idempotent by the latest-wins window).
    """

    def __init__(
        self,
        spark: SparkSession,
        warehouse_dir: str,
        schema_name: str,
        *,
        merge_buckets: int | None = None,
        merge_salt: int | None = None,
    ) -> None:
        self.spark = spark
        self.root = os.path.join(warehouse_dir, schema_name)
        self.merge_buckets = merge_buckets
        # Optional hot-PK salting for the merge dedup window (see
        # _dedup_latest); operators/skew.py documents the cost model.
        self.merge_salt = merge_salt
        os.makedirs(self.root, exist_ok=True)

    def _bucket_expr(self, primary_keys: list[str], n_buckets: int):
        return F.pmod(
            F.abs(F.xxhash64(*[F.col(k).cast("string") for k in primary_keys])),
            F.lit(n_buckets),
        )

    # -- bucket-layout metadata --------------------------------------------
    # The bucket count is part of the TABLE's physical layout, not the
    # store's config: hashing incoming keys with a different N than the
    # one the table was written with silently strands stale rows in old
    # buckets. Persist N in a sidecar (outside the table dir, so the
    # replace swap can't drop it) and always hash with the persisted
    # value; a bucketed table with no sidecar (pre-metadata layout) is
    # migrated by full rewrite on the next merge.

    def _meta_path(self, table_name: str) -> str:
        return self.table_path(table_name) + "._bucket_meta.json"

    def _persisted_buckets(self, table_name: str) -> int | None:
        try:
            with open(self._meta_path(table_name)) as f:
                n = json.load(f).get("merge_buckets")
                return int(n) if n else None
        except (OSError, ValueError):
            return None

    def _write_bucket_meta(self, table_name: str, n_buckets: int | None) -> None:
        meta = self._meta_path(table_name)
        if not n_buckets:
            with contextlib.suppress(OSError):
                os.remove(meta)
            return
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"merge_buckets": n_buckets}, f)
        os.replace(tmp, meta)

    def table_path(self, table_name: str) -> str:
        return os.path.join(self.root, table_name)

    def table_exists(self, table_name: str) -> bool:
        path = self.table_path(table_name)
        if not os.path.isdir(path):
            return False
        return any(
            f.endswith(".parquet") or f.startswith(f"{BUCKET_COL}=")
            for f in os.listdir(path)
        )

    def _read_raw(self, table_name: str) -> DataFrame:
        # mergeSchema handles auto-added columns across appends
        # (schema evolution parity with sql_processor.py:934-981).
        return self.spark.read.option("mergeSchema", "true").parquet(
            self.table_path(table_name)
        )

    def read(self, table_name: str) -> DataFrame:
        df = self._read_raw(table_name)
        return df.drop(BUCKET_COL) if BUCKET_COL in df.columns else df

    def list_tables(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d)) and not d.startswith("_tmp_")
        )

    def drop(self, table_name: str) -> None:
        shutil.rmtree(self.table_path(table_name), ignore_errors=True)
        self._write_bucket_meta(table_name, None)

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

    def _with_bucket(
        self,
        df: DataFrame,
        primary_keys: list[str] | None,
        n_buckets: int | None = None,
    ) -> DataFrame:
        n = n_buckets or self.merge_buckets
        if n and primary_keys:
            return df.withColumn(BUCKET_COL, self._bucket_expr(primary_keys, n))
        return df

    def _writer(self, df: DataFrame):
        w = df.write
        return w.partitionBy(BUCKET_COL) if BUCKET_COL in df.columns else w

    def write_append(
        self, df: DataFrame, table_name: str, primary_keys: list[str] | None = None
    ) -> None:
        exists = self.table_exists(table_name)
        n_buckets = self.merge_buckets
        if exists:
            # Align by name against the existing table's schema; new
            # columns flow through (mergeSchema on read).
            existing_cols = set(self.read(table_name).columns)
            new_cols = [c for c in df.columns if c not in existing_cols]
            ordered = [c for c in df.columns if c in existing_cols] + new_cols
            df = df.select(*ordered)
            if BUCKET_COL in self._read_raw(table_name).columns:
                # Appends to a bucketed table MUST hash with the
                # table's layout N, whatever the store config says.
                n_buckets = self._persisted_buckets(table_name) or n_buckets
            else:
                n_buckets = None  # never mix bucketed + unbucketed files
        df = self._with_bucket(df, primary_keys, n_buckets)
        self._writer(df).mode("append").parquet(self.table_path(table_name))
        if (
            BUCKET_COL in df.columns
            and not exists
            and self._persisted_buckets(table_name) is None
        ):
            # Stamp only tables THIS write created: for a pre-metadata
            # bucketed table the existing files' hash N is unknown, and
            # stamping the store's current N would wrongly unlock the
            # incremental merge path (stale rows under the old hashing
            # would never be overwritten). Unstamped tables keep taking
            # the full-rewrite merge, which re-buckets and then stamps.
            self._write_bucket_meta(table_name, n_buckets)

    def write_replace(
        self, df: DataFrame, table_name: str, primary_keys: list[str] | None = None
    ) -> None:
        temp = self._temp_name(table_name)
        df = self._with_bucket(df, primary_keys)
        self._writer(df).mode("overwrite").parquet(self.table_path(temp))
        self._swap_in(temp, table_name)
        self._write_bucket_meta(
            table_name,
            self.merge_buckets if BUCKET_COL in df.columns else None,
        )

    def _dedup_latest(
        self,
        incoming: DataFrame,
        primary_keys: list[str],
        *,
        salt: int | None = None,
    ) -> DataFrame:
        # One shuffle on the PK; window + dedup ride the same partitioning.
        order = [
            F.col(AB_EXTRACTED_AT_COLUMN).desc_nulls_last(),
            F.col(AB_RAW_ID_COLUMN).desc_nulls_last(),
        ]
        salt = salt or self.merge_salt
        if salt and salt > 1:
            # Hot-PK guard: a pathological key (one entity re-synced
            # millions of times) is ONE window partition. Pre-reduce on
            # (pk, salt) so each key reaches the exact window with at
            # most `salt` candidates — the per-salt latest always
            # includes the global latest, so the result is identical.
            # The salt is a deterministic hash of the raw id: retries
            # route rows the same way, and any routing is correct (the
            # ORDER columns, not the salt, decide the winner).
            w1 = Window.partitionBy(*primary_keys, "__salt").orderBy(*order)
            incoming = (
                incoming.withColumn(
                    "__salt",
                    F.pmod(
                        F.xxhash64(F.col(AB_RAW_ID_COLUMN).cast("string")),
                        F.lit(salt),
                    ),
                )
                .withColumn("__rn", F.row_number().over(w1))
                .filter(F.col("__rn") == 1)
                .drop("__rn", "__salt")
            )
        w = Window.partitionBy(*primary_keys).orderBy(*order)
        return (
            incoming.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def write_merge(self, df: DataFrame, table_name: str, primary_keys: list[str]) -> None:
        if not primary_keys:
            raise ValueError("merge requires primary keys")
        exists = self.table_exists(table_name)
        bucketed_table = (
            exists and BUCKET_COL in self._read_raw(table_name).columns
        )
        layout_n = self._persisted_buckets(table_name) if bucketed_table else None
        if bucketed_table and layout_n:
            # Incremental path: touch only the buckets incoming keys
            # hash into — hashing with the TABLE's persisted bucket
            # count (a store reopened with a different merge_buckets
            # would otherwise probe/overwrite the wrong buckets and
            # leave stale PK rows behind). The filter prunes partitions
            # at the scan; the dynamic overwrite replaces only
            # partitions present in the output (= exactly the incoming
            # buckets). A bucketed table with NO sidecar falls through
            # to the full rewrite, which re-buckets and writes the meta.
            incoming = self._with_bucket(df, primary_keys, layout_n)
            buckets = [r[0] for r in incoming.select(BUCKET_COL).distinct().collect()]
            old = self._read_raw(table_name).filter(F.col(BUCKET_COL).isin(buckets))
            latest = self._dedup_latest(
                old.unionByName(incoming, allowMissingColumns=True), primary_keys
            )
            (
                latest.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(BUCKET_COL)
                .parquet(self.table_path(table_name))
            )
            return
        incoming = df
        if exists:
            incoming = self.read(table_name).unionByName(
                incoming, allowMissingColumns=True
            )
        latest = self._dedup_latest(incoming, primary_keys)
        # Full rewrite (also the one-time migration INTO the bucketed
        # layout when merge_buckets is set on an unbucketed table, or
        # into the CURRENT bucket count for a metadata-less table).
        latest = self._with_bucket(latest, primary_keys)
        temp = self._temp_name(table_name)
        self._writer(latest).mode("overwrite").parquet(self.table_path(temp))
        self._swap_in(temp, table_name)
        self._write_bucket_meta(
            table_name,
            self.merge_buckets if BUCKET_COL in latest.columns else None,
        )

    def write(
        self,
        df: DataFrame,
        table_name: str,
        method: WriteMethod,
        primary_keys: list[str] | None = None,
    ) -> None:
        if method == WriteMethod.APPEND:
            self.write_append(df, table_name, primary_keys)
        elif method == WriteMethod.REPLACE:
            self.write_replace(df, table_name, primary_keys)
        elif method == WriteMethod.MERGE:
            self.write_merge(df, table_name, primary_keys or [])
        else:  # pragma: no cover
            raise ValueError(f"unknown write method {method}")
