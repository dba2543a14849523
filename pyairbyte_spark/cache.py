"""SparkCache — the landing zone ("cache") for record streams.

Parity with the reference's ``CacheBase`` (``airbyte/caches/base.py``):
one table per stream plus internal catalog/state metadata, lazy dataset
access, pandas/Arrow export, and a guarded raw-SQL surface. The backing
store is a parquet warehouse directory managed by :class:`TableStore`;
on a cluster this directory lives on shared storage and every operation
below is already distributed-safe (no driver-side row loops).
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Mapping
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from pyairbyte_spark.catalog import CatalogBackend, StreamSpec
from pyairbyte_spark.constants import DEFAULT_ARROW_MAX_CHUNK_SIZE, DEFAULT_CACHE_SCHEMA
from pyairbyte_spark.datasets import CachedDataset
from pyairbyte_spark.names import LowerCaseNormalizer
from pyairbyte_spark.sql_guard import guard_sql
from pyairbyte_spark.state import (
    BackendStateWriter,
    StateBackend,
    StateProvider,
)
from pyairbyte_spark.strategies import WriteMethod
from pyairbyte_spark.writers import CommitLogTableStore, TableStore


class SparkCache(Mapping):
    """A Spark-managed warehouse acting as the sync landing zone."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse_dir: str,
        *,
        schema_name: str = DEFAULT_CACHE_SCHEMA,
        table_prefix: str = "",
        merge_buckets: int | None = None,
        merge_salt: int | None = None,
        table_format: str = "parquet",
        fileio=None,
        harvest_sums: bool = False,
    ) -> None:
        """``table_format="commitlog"`` switches the backing store to
        :class:`~pyairbyte_spark.writers.CommitLogTableStore` — ACID
        commits (atomic REPLACE/MERGE, snapshot reads, time travel,
        vacuum) at the cost of a manifest read per table access; the
        default ``"parquet"`` store is the plain rename-swap layout.
        ``fileio`` injects the store's metadata-I/O backend
        (``fileio.py``: local default, ``HadoopFileIO`` for HDFS-class
        deployments, conditional-PUT FileIO for object stores).
        ``harvest_sums=True`` harvests per-file column SUMs at write
        time so sum/avg aggregate pushdowns answer from metadata
        (``build_sum_stats`` backfills tables written without it)."""
        self.spark = spark
        self.warehouse_dir = warehouse_dir
        self.schema_name = schema_name
        self.table_prefix = table_prefix
        os.makedirs(warehouse_dir, exist_ok=True)
        store_cls = {"parquet": TableStore, "commitlog": CommitLogTableStore}.get(
            table_format
        )
        if store_cls is None:
            raise ValueError(
                f"unknown table_format {table_format!r}; use 'parquet' or 'commitlog'"
            )
        self.store = store_cls(
            spark,
            warehouse_dir,
            schema_name,
            merge_buckets=merge_buckets,
            merge_salt=merge_salt,
            fileio=fileio,
            harvest_sums=harvest_sums,
        )
        self.catalog_backend = CatalogBackend(warehouse_dir)
        self.state_backend = StateBackend(warehouse_dir)
        self.destination_state_backend = StateBackend(
            warehouse_dir, table_name="_airbyte_destination_state"
        )

    # -- table naming -------------------------------------------------------

    def table_name(self, stream_name: str) -> str:
        return self.table_prefix + LowerCaseNormalizer.normalize(stream_name)

    # -- dataset access (Mapping protocol like ReadResult/cache.streams) ----

    @property
    def stream_names(self) -> list[str]:
        prefix = self.table_prefix
        return [
            t[len(prefix):] if prefix and t.startswith(prefix) else t
            for t in self.store.list_tables()
        ]

    @property
    def streams(self) -> dict[str, CachedDataset]:
        return {name: self.get_dataset(name) for name in self.stream_names}

    def get_dataset(self, stream_name: str) -> CachedDataset:
        df = self.store.read(self.table_name(stream_name))
        spec = self.catalog_backend.get(stream_name)
        return CachedDataset(
            df,
            stream_name,
            display_name_map=spec.display_name_map if spec else None,
        )

    def __getitem__(self, stream_name: str) -> CachedDataset:
        return self.get_dataset(stream_name)

    def __contains__(self, stream_name: str) -> bool:
        return self.store.table_exists(self.table_name(str(stream_name)))

    def __iter__(self) -> Iterator[str]:
        return iter(self.stream_names)

    def __len__(self) -> int:
        return len(self.stream_names)

    # -- write path ---------------------------------------------------------

    def write_dataframe(
        self,
        df: DataFrame,
        stream_name: str,
        method: WriteMethod = WriteMethod.APPEND,
        primary_keys: list[str] | None = None,
        *,
        expectations: dict | None = None,
        on_violation: str = "fail",
        txn: tuple[str, int] | None = None,
        txn_group=None,
    ) -> dict[str, int] | None:
        """Write with optional CHECK-constraint enforcement (see
        ``expectations.py``). Returns per-check violation counts when
        expectations ran (``drop`` counts are exact — observed during
        the write itself), else None. ``quarantine`` mode lands the
        violating rows in ``<stream>_quarantine`` with a
        ``_failed_expectations`` column. ``txn=(app_id, batch_id)``
        threads the commit-log store's SetTransaction idempotence
        watermark through (exactly-once replays; the follower's
        provenance stamp). ``txn_group`` joins the write to a
        multi-table transaction: pass the ``MultiTableTxn`` OBJECT to
        stage with deferred slot claims (the atomic sync's path — no
        stream's slot is held while later streams run Spark jobs), or
        a group-id string to prepare eagerly under that group."""
        from pyairbyte_spark.writers import MultiTableTxn

        if isinstance(txn_group, MultiTableTxn):
            target = txn_group  # stage now, claim slots at commit()
            kw = {}
        else:
            target = self.store
            kw = {} if txn_group is None else {"txn_group": txn_group}
        if not expectations:
            target.write(
                df, self.table_name(stream_name), method, primary_keys,
                txn=txn, **kw,
            )
            return None
        from pyairbyte_spark.expectations import check_expectations

        clean, quarantined, obs = check_expectations(
            df, expectations, on_violation=on_violation
        )
        target.write(
            clean, self.table_name(stream_name), method, primary_keys,
            txn=txn, **kw,
        )
        if quarantined is not None:
            # Quarantine rows are part of the same batch: they ride the
            # same txn group (an aborted sync leaves NO quarantine rows
            # visible — all-or-nothing covers both tables) and the same
            # idempotence watermark (a replayed batch skips here too).
            target.write(
                quarantined,
                self.table_name(f"{stream_name}_quarantine"),
                WriteMethod.APPEND,
                None,
                txn=txn,
                **kw,
            )
        if obs is not None:
            return obs.counts
        return {name: 0 for name in expectations}  # fail mode, all passed

    def register_stream(self, spec: StreamSpec) -> None:
        self.catalog_backend.register(spec)

    # -- table maintenance / time travel (commit-log stores) -----------------

    def _acid_store(self):
        from pyairbyte_spark.writers import CommitLogTableStore

        if not isinstance(self.store, CommitLogTableStore):
            raise NotImplementedError(
                "table history/time-travel/vacuum/compact need the ACID "
                'store: SparkCache(..., table_format="commitlog")'
            )
        return self.store

    def table_history(self, stream_name: str) -> list[dict]:
        """Commit history for one stream's table, newest first."""
        return self._acid_store().history(self.table_name(stream_name))

    def read_stream_version(self, stream_name: str, version: int) -> DataFrame:
        """Time travel: the stream's table as of a commit version."""
        return self._acid_store().read_version(self.table_name(stream_name), version)

    def vacuum(
        self,
        stream_name: str,
        *,
        keep_commits: int = 1,
        keep_hours: float | None = None,
    ) -> list[str]:
        """Reclaim unreferenced data dirs + old commits for one stream
        (``keep_hours``: time-based retention horizon)."""
        return self._acid_store().vacuum(
            self.table_name(stream_name),
            keep_commits=keep_commits,
            keep_hours=keep_hours,
        )

    def compact(
        self,
        stream_name: str,
        *,
        sort_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        target_files: int | None = None,
    ) -> dict:
        """Collapse an append-fragmented table into one data dir;
        ``sort_by`` (linear) or ``zorder_by`` (multi-dimensional)
        clusters it for data skipping (OPTIMIZE-style)."""
        return self._acid_store().compact(
            self.table_name(stream_name),
            sort_by=sort_by,
            zorder_by=zorder_by,
            target_files=target_files,
        )

    def verify_stream(self, stream_name: str, *, deep: bool = False) -> dict:
        """FSCK a cached stream's table: manifest resolution, physical
        file presence + size drift, DV/bloom sidecars, txn-decision
        invariants, orphan dirs — pure metadata I/O, no Spark job."""
        return self._acid_store().verify_table(
            self.table_name(stream_name), deep=deep
        )

    def maintenance_plan(self, stream_name: str, **thresholds) -> list[dict]:
        """Table doctor for a cached stream: which maintenance actions
        (compact / refresh_bloom / vacuum / resolve) are worth running,
        from one metadata inspection (``writers.maintenance_plan``)."""
        return self._acid_store().maintenance_plan(
            self.table_name(stream_name), **thresholds
        )

    def store_maintenance_plan(self, **thresholds) -> dict:
        """STORE-WIDE doctor: every table's maintenance plan, the
        derived indexes' tombstone/staleness debt (fold_*/refresh_*),
        and the txn-group decision backlog — one call
        (``writers.store_maintenance_plan``)."""
        return self._acid_store().store_maintenance_plan(**thresholds)

    def apply_maintenance_plan(
        self, plan: dict | None = None, *, dry_run: bool = False, **kw
    ) -> dict:
        """EXECUTE the store-wide doctor's prescriptions — one call
        heals the warehouse (compact/bloom-recover/vacuum, index
        folds/refreshes, txn-decision vacuum); judgment calls
        (drop_ref/review_ingest/resolve) are reported, never
        auto-applied (``writers.apply_maintenance_plan``)."""
        return self._acid_store().apply_maintenance_plan(
            plan, dry_run=dry_run, **kw
        )

    def agg_stream_rows(
        self,
        stream_name: str,
        aggs: "list[tuple[str, str]]",
        predicates: list | None = None,
    ) -> dict:
        """EXACT filtered COUNT/SUM/MIN/MAX/AVG list with metadata
        short-circuits — :meth:`count_stream_rows` generalized
        (``CommitLogTableStore.agg_where``): must-match files answer
        from footer stats (sums too, when harvested), boundary files
        scan with the residual filter."""
        return self._acid_store().agg_where(
            self.table_name(stream_name),
            [tuple(a) for a in aggs],
            predicates,
        )

    def build_sum_stats(
        self, stream_name: str, columns: "list[str] | None" = None
    ) -> dict:
        """Backfill per-file column SUMs into the stream's manifest
        stats so sum/avg aggregate pushdowns answer from metadata —
        one column-pruned job over exactly the files still missing a
        sum, published as a row-preserving repair_metadata commit
        (``CommitLogTableStore.build_sum_stats``; write-time harvest:
        ``SparkCache(..., harvest_sums=True)``)."""
        return self._acid_store().build_sum_stats(
            self.table_name(stream_name), columns
        )

    def rebucket_stream(self, stream_name: str, n_buckets: int | None) -> dict:
        """Bucket-layout evolution: rewrite the stream's table with a
        new merge-bucket count (None = un-bucket) — the migration path
        when key cardinality outgrows the original layout. One shuffle;
        rows identical (CDF-silent); later merges use the new N."""
        return self._acid_store().rebucket_table(
            self.table_name(stream_name), n_buckets
        )

    def count_stream_rows(
        self, stream_name: str, predicates: list | None = None
    ) -> dict:
        """EXACT filtered count with metadata short-circuits: files the
        zone maps prove fully-matching contribute footer row counts
        without being read; only boundary files scan
        (``CommitLogTableStore.count_where``)."""
        return self._acid_store().count_where(
            self.table_name(stream_name), predicates
        )

    def create_stream_branch(
        self, stream_name: str, branch: str, *, at_version: int | None = None
    ) -> dict:
        """Fork a write-audit-publish branch of the stream's table
        (one ~100-byte ref PUT; no data moves). Write the candidate
        state via ``branch_stream_writer``, audit it with
        ``read_stream_branch``, then ``publish_stream_branch``."""
        return self._acid_store().create_branch(
            self.table_name(stream_name), branch, at_version=at_version
        )

    def read_stream_branch(self, stream_name: str, branch: str):
        """The branch's CANDIDATE state (main readers never see it)."""
        return (
            self._acid_store()
            .branch(branch)
            .read(self.table_name(stream_name))
        )

    def branch_stream_writer(self, branch: str):
        """The store view pinned to ``branch``: full DML surface
        (append/replace/merge/delete/update/optimize) against the fork,
        invisible on main until publish."""
        return self._acid_store().branch(branch)

    def publish_stream_branch(
        self,
        stream_name: str,
        branch: str,
        *,
        drop: bool = True,
        mode: str = "ff",
    ) -> int:
        """Fast-forward main to the audited branch tip with ONE commit
        (refuses if main diverged past the fork;
        ``mode="rebase-appends"`` grafts an append-only branch onto an
        advanced main). Returns the published main version."""
        return self._acid_store().publish_branch(
            self.table_name(stream_name), branch, drop=drop, mode=mode
        )

    def drop_stream_branch(self, stream_name: str, branch: str) -> None:
        """Abandon an audit branch (releases vacuum's retention floor;
        the branch's commits age out as ordinary dead slots)."""
        self._acid_store().drop_branch(self.table_name(stream_name), branch)

    def stream_refs(self, stream_name: str) -> dict:
        """All named refs (branches + tags) of the stream's table."""
        return self._acid_store().refs(self.table_name(stream_name))

    def create_stream_tag(
        self, stream_name: str, tag: str, *, version: int | None = None
    ) -> dict:
        """Pin a readable snapshot under an immutable name (release
        audit / eval-set freeze); holds vacuum's floor until dropped."""
        return self._acid_store().create_tag(
            self.table_name(stream_name), tag, version=version
        )

    def read_stream_tag(self, stream_name: str, tag: str):
        return self._acid_store().read_tag(self.table_name(stream_name), tag)

    def drop_stream_tag(self, stream_name: str, tag: str) -> None:
        self._acid_store().drop_tag(self.table_name(stream_name), tag)

    def set_stream_cluster_by(
        self, stream_name: str, columns: "list[str] | None"
    ) -> int:
        """Write-time clustering property: every later append to this
        stream's table range-sorts on ``columns`` before staging, so
        zone maps stay selective through ingest (None clears)."""
        return self._acid_store().set_cluster_by(
            self.table_name(stream_name), columns
        )

    def rename_stream_column(self, stream_name: str, old: str, new: str) -> int:
        """Metadata-only column rename (zero data I/O)."""
        return self._acid_store().rename_column(
            self.table_name(stream_name), old, new
        )

    def drop_stream_column(self, stream_name: str, name: str) -> int:
        """Metadata-only column drop (zero data I/O)."""
        return self._acid_store().drop_column(self.table_name(stream_name), name)

    def stream_feed(self, stream_name: str, **options) -> DataFrame:
        """``readStream`` over the stream's commit-log table (commit
        version = Spark offset). Options pass through to the
        ``commitlog_feed`` source: ``start_version``,
        ``max_files_per_trigger``, ``max_commits_per_trigger``."""
        from pyairbyte_spark.sources.commitlog_stream import register

        self._acid_store()  # raises for non-commitlog caches
        register(self.spark)
        reader = self.spark.readStream.format("commitlog_feed").option(
            "path", self.store.table_path(self.table_name(stream_name))
        )
        for k, v in options.items():
            reader = reader.option(k, str(v))
        return reader.load()

    def clone_stream(self, source: str, dest: str) -> int:
        """SHALLOW CLONE: zero-copy snapshot of ``source`` as a new
        stream table referencing the source's files; diverges
        independently (``writers.clone_table``)."""
        return self._acid_store().clone_table(
            self.table_name(source), self.table_name(dest)
        )

    def begin_txn(self):
        """Atomic MULTI-TABLE transaction over this cache's store
        (``writers.MultiTableTxn``): append/replace several stream
        tables and flip them visible with ONE decision-file PUT —
        all-or-nothing across streams. Pass ``cache.table_name(s)`` as
        the table argument for stream tables."""
        return self._acid_store().begin_txn()

    def read_stream_as_of(self, stream_name: str, ts) -> DataFrame:
        """TIMESTAMP AS OF time travel: the stream's snapshot live at
        the given wall-clock time (epoch seconds, datetime, or ISO
        string)."""
        return self._acid_store().read_as_of(
            self.table_name(stream_name), ts
        )

    def snapshot_streams(
        self,
        streams: "list[str] | dict[str, int] | None" = None,
        *,
        chain: "list[tuple[str, str]] | None" = None,
        follower_name: str = "feed",
    ) -> "CacheSnapshot":
        """Pin several streams at a CONSISTENT version vector and read
        them all through one handle — the read-side half of
        :meth:`begin_txn` (that closes the torn-WRITE window; this
        closes the torn-READ one: a join over ``clean`` ⋈ ``agg``
        mid-update never mixes a fresh upstream with a stale
        downstream).

        Three pinning modes:

        - ``streams=[...]`` — pin each at its current latest (the
          capture order is the consistency statement; right for
          independent streams);
        - ``streams={name: version}`` — explicit vector (e.g. from a
          saved pin);
        - ``chain=[("raw", "clean"), ("clean", "agg")]`` — streams
          maintained by :class:`~pyairbyte_spark.streaming
          .ChangeFeedFollower` hops in THIS cache: pin the tail at its
          latest, then walk upstream reading each hop's PROVENANCE
          watermark (the source version its pinned destination was
          built from, recorded atomically in the destination's data
          commit) — torn-free however mid-update the pipeline is,
          without needing the follower objects. ``follower_name``
          must match the hops' (default matches theirs).

        Pinned versions stay readable until vacuum passes them."""
        store = self._acid_store()
        if (streams is None) == (chain is None):
            raise ValueError("pass exactly one of streams= / chain=")
        if chain is not None:
            for (_, d1), (s2, _) in zip(chain, chain[1:]):
                if d1 != s2:
                    raise ValueError(
                        f"chain break: hop into {d1!r} does not feed "
                        f"the hop from {s2!r}"
                    )
            tail_dst = chain[-1][1]
            versions = {
                tail_dst: store.latest_version(self.table_name(tail_dst))
            }
            for src, dst in reversed(chain):
                man = store._read_manifest(
                    self.table_name(dst), versions[dst]
                )
                app = f"{follower_name}:{src}->{dst}"
                sv = int((man.get("txns") or {}).get(app, 0))
                if sv <= 0:
                    raise ValueError(
                        f"hop {src!r}→{dst!r} has no recorded provenance "
                        f"under {app!r} yet (run the follower first, or "
                        "pass its follower_name)"
                    )
                versions[src] = sv
        elif isinstance(streams, dict):
            versions = {s: int(v) for s, v in streams.items()}
        else:
            versions = {
                s: store.latest_version(self.table_name(s))
                for s in streams
            }
        pin = store.snapshot(
            {self.table_name(s): v for s, v in versions.items()}
        )
        return CacheSnapshot(self, pin, versions)

    def restore_stream(self, stream_name: str, version: int) -> int:
        """Roll the stream's table back to ``version`` as a NEW commit
        (Delta RESTORE; metadata-only, auditable, time-travelable)."""
        return self._acid_store().restore(self.table_name(stream_name), version)

    def set_stream_check(self, stream_name: str, name: str, expr: str) -> int:
        """Add/replace a persisted CHECK constraint (validates existing
        rows first; enforced in-flight by every later write incl.
        UPDATE rewrites)."""
        return self._acid_store().set_check(
            self.table_name(stream_name), name, expr
        )

    def drop_stream_check(self, stream_name: str, name: str) -> int:
        return self._acid_store().drop_check(self.table_name(stream_name), name)

    def stream_checks(self, stream_name: str) -> dict[str, str]:
        return self._acid_store().table_checks(self.table_name(stream_name))

    def analyze_stream_ndv(
        self, stream_name: str, columns: list[str], *, p: int = 8
    ) -> dict:
        """ANALYZE: compute + persist per-column NDV registers (one
        stacked scan) in the table's stats sidecar."""
        from pyairbyte_spark import ndv

        return ndv.analyze_ndv(
            self._acid_store(), self.table_name(stream_name), columns, p=p
        )

    def stream_approx_distinct(
        self, stream_name: str, *, p: int = 8
    ) -> dict[str, int]:
        """Per-column approximate distinct counts from maintained NDV
        stats — catches up from the change feed (append/compact) or
        re-analyzes (DML), never scans data to serve."""
        from pyairbyte_spark import ndv

        return ndv.approx_distinct(
            self.spark, self._acid_store(), self.table_name(stream_name), p=p
        )

    def delete_stream_where(
        self, stream_name: str, predicates: list[tuple], *, mode: str = "cow"
    ) -> dict:
        """File-pruned DELETE (SQL semantics: TRUE deletes, NULL
        stays); one atomic commit, time travel preserved until vacuum.
        ``mode="mor"`` records position deletion vectors instead of
        rewriting files (the 100 TB point-delete path)."""
        return self._acid_store().delete_where(
            self.table_name(stream_name), predicates, mode=mode
        )

    def merge_stream_into(
        self,
        stream_name: str,
        source: DataFrame,
        on: list[str],
        *,
        when_matched_update: dict | None = None,
        when_matched_delete=False,
        when_not_matched_insert: bool = True,
    ) -> dict:
        """Clause-based MERGE INTO (Delta subset): matched
        update/delete + not-matched insert in one atomic commit."""
        return self._acid_store().merge_into(
            self.table_name(stream_name),
            source,
            on,
            when_matched_update=when_matched_update,
            when_matched_delete=when_matched_delete,
            when_not_matched_insert=when_not_matched_insert,
        )

    def build_stream_bloom_index(
        self,
        stream_name: str,
        columns: list[str],
        *,
        fpr: float = 0.01,
        only_missing: bool = False,
    ) -> dict:
        """Per-file bloom index for equality lookups on the given
        columns (``writers.build_bloom_index``); re-run with
        ``only_missing=True`` on the maintenance cadence to cover
        post-build appends."""
        return self._acid_store().build_bloom_index(
            self.table_name(stream_name),
            columns,
            fpr=fpr,
            only_missing=only_missing,
        )

    def optimize_stream(
        self,
        stream_name: str,
        *,
        small_file_bytes: int = 32 << 20,
        min_files: int = 2,
    ) -> dict:
        """Bin-packing small-file compaction (full ``compact`` stays
        the re-clustering tool)."""
        return self._acid_store().optimize(
            self.table_name(stream_name),
            small_file_bytes=small_file_bytes,
            min_files=min_files,
        )

    def add_stream_column(
        self, stream_name: str, name: str, type_ddl: str, *, default=None
    ) -> int:
        """Metadata-only ADD COLUMN with an existing-rows default
        (zero data I/O)."""
        return self._acid_store().add_column(
            self.table_name(stream_name), name, type_ddl, default=default
        )

    def update_stream_where(
        self,
        stream_name: str,
        predicates: list[tuple],
        assignments: dict,
    ) -> dict:
        """File-pruned UPDATE … SET … WHERE (pre-update-value
        semantics); one atomic commit."""
        return self._acid_store().update_where(
            self.table_name(stream_name), predicates, assignments
        )

    def read_stream_changes(
        self,
        stream_name: str,
        from_version: int,
        to_version: int | None = None,
        *,
        include_preimages: bool = False,
    ) -> DataFrame:
        """Change data feed: row changes between two commit versions
        (``_change_type`` + ``_commit_version`` columns);
        ``include_preimages`` adds ``update_preimage`` rows for
        incremental consumers."""
        return self._acid_store().read_changes(
            self.table_name(stream_name),
            from_version,
            to_version,
            include_preimages=include_preimages,
        )

    def read_stream_where(
        self,
        stream_name: str,
        predicates: list[tuple],
        *,
        version: int | None = None,
    ) -> DataFrame:
        """Data-skipping read: prune files via manifest zone maps, then
        apply the same predicates row-level (exact either way)."""
        return self._acid_store().read_where(
            self.table_name(stream_name), predicates, version=version
        )

    # -- export surface -----------------------------------------------------

    def get_pandas_dataframe(self, stream_name: str):
        """Full-table pandas export (reference caches/base.py:283-290)."""
        return self.get_dataset(stream_name).to_pandas()

    def get_arrow_dataset(
        self, stream_name: str, *, max_chunk_size: int = DEFAULT_ARROW_MAX_CHUNK_SIZE
    ):
        """Chunked Arrow export (reference caches/base.py:292-322)."""
        return self.get_dataset(stream_name).to_arrow(max_chunk_size=max_chunk_size)

    def get_records(self, stream_name: str) -> Iterator[dict[str, Any]]:
        return iter(self.get_dataset(stream_name))

    # -- SQL surface ---------------------------------------------------------

    def register_views(self) -> None:
        for name in self.stream_names:
            self.get_dataset(name).to_spark().createOrReplaceTempView(
                LowerCaseNormalizer.normalize(name)
            )

    def run_sql_query(
        self, sql: str, *, max_records: int | None = None
    ) -> list[dict[str, Any]]:
        """Guarded SQL passthrough (reference caches/base.py:195-241 +
        the MCP read-only gate mcp/local.py:753-846)."""
        self.register_views()
        df = self.spark.sql(guard_sql(sql))
        if max_records is not None:
            df = df.limit(max_records)
        return [r.asDict() for r in df.collect()]

    def sql(self, sql: str) -> DataFrame:
        """Lazy guarded SQL → DataFrame (Spark-native surface)."""
        self.register_views()
        return self.spark.sql(guard_sql(sql))

    # -- state --------------------------------------------------------------

    def get_state_provider(self, source_name: str) -> StateProvider:
        return StateProvider(self.state_backend.read(source_name, self.table_prefix))

    def get_state_writer(self, source_name: str) -> BackendStateWriter:
        return BackendStateWriter(self.state_backend, source_name, self.table_prefix)

    def get_destination_state_provider(self, destination_name: str) -> StateProvider:
        return StateProvider(
            self.destination_state_backend.read(destination_name, self.table_prefix)
        )

    def get_destination_state_writer(self, destination_name: str) -> BackendStateWriter:
        return BackendStateWriter(
            self.destination_state_backend, destination_name, self.table_prefix
        )


class CacheSnapshot:
    """A pinned multi-stream view of a :class:`SparkCache` (see
    :meth:`SparkCache.snapshot_streams`). Immutable: the stream →
    version vector is fixed at construction, every read resolves
    through it, and concurrent writers are invisible to the holder."""

    def __init__(
        self, cache: SparkCache, pin, versions: dict[str, int]
    ) -> None:
        self._cache = cache
        self._pin = pin  # writers.StoreSnapshot over table names
        self.versions = dict(versions)

    def read(self, stream_name: str) -> DataFrame:
        return self._pin.read(self._cache.table_name(stream_name))

    def read_where(self, stream_name: str, predicates) -> DataFrame:
        return self._pin.read_where(
            self._cache.table_name(stream_name), predicates
        )

    def __repr__(self) -> str:  # pragma: no cover
        return f"CacheSnapshot({self.versions!r})"
