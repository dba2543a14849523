"""Change-feed follower: incremental table-to-table pipelines on the
commit-log store.

The commit-log store is a sink (`CacheStreamingSink`, `writers.py`)
and, with `read_changes`, a SOURCE: a follower tails a table's commit
log and applies each change window to a downstream table through an
optional transform. That turns a chain of cached tables into an
incremental pipeline — raw → cleaned → aggregated — where each hop
processes only what changed, the table-to-table version of the
reference's source→cache sync loop (``airbyte/sources/base.py``
read + state protocol), with commit versions playing the cursor role.

Crash contract (same T2 ordering as the record pipeline,
``processor.py``): the destination DATA commit happens first, the
follower's cursor (the source version just processed) second. A crash
between the two replays the window on restart; with the merge
strategy (the default — the change feed carries primary keys for it)
the replay converges, so delivery is effectively-once. No Spark
streaming machinery is needed: the commit log itself is the
write-ahead log, and `process_once` is the micro-batch.

At 100 TB: each cycle moves only the changed rows (appends: the new
files; merges: the touched buckets' diff) — a follower on a table
taking 0.1% daily updates reads 0.1%, never the table. The cursor
lookup and commit are O(1) metadata operations.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame

from pyairbyte_spark.cache import SparkCache
from pyairbyte_spark.state import StateArtifact
from pyairbyte_spark.strategies import WriteMethod


class ChangeFeedFollower:
    """Tail ``source_stream``'s commit log in ``source_cache``; apply
    each change window to ``dest_stream`` in ``dest_cache``.

    ``transform(df) -> df`` sees the raw change frame, including the
    ``_change_type`` / ``_commit_version`` columns. AFTER the
    transform the follower applies CDC semantics itself
    (:meth:`_finalize_window`): deletes leave the forward path (they
    are routed by ``apply_deletes``), each key is reduced to its LAST
    change in the window by commit version, the feed columns are
    stripped, and the extraction stamp is refreshed to apply time so
    the window's end-state supersedes whatever the destination holds.
    With ``method=MERGE`` (default) the destination converges under
    replay; APPEND followers are at-least-once under crashes — same
    trade as the record pipeline.
    """

    CURSOR_KEY = "source_version"

    MAX_DELETE_KEYS = 100_000

    def __init__(
        self,
        source_cache: SparkCache,
        source_stream: str,
        dest_cache: SparkCache,
        dest_stream: str,
        *,
        transform: Callable[[DataFrame], DataFrame] | None = None,
        method: WriteMethod = WriteMethod.MERGE,
        primary_keys: list[str] | None = None,
        follower_name: str = "feed",
        apply_deletes: bool = False,
        max_versions_per_cycle: int | None = None,
        snapshot_diff: bool = True,
    ) -> None:
        self.source_cache = source_cache
        self.source_stream = source_stream
        self.dest_cache = dest_cache
        self.dest_stream = dest_stream
        self.transform = transform
        self.method = method
        self.primary_keys = primary_keys or []
        # Cursor state is scoped per (follower, destination stream) in
        # the DESTINATION cache's state backend, so it lives and dies
        # with the data it guards.
        self.source_name = f"{follower_name}:{source_stream}"
        # SetTransaction identity for the destination writes: the
        # processed source version rides the dest DATA COMMIT itself
        # (atomic, unlike the cursor state row) — replayed windows
        # skip (exactly-once for merge AND append hops), and each dest
        # commit carries PROVENANCE: which source version it was built
        # from. consistent_snapshot() reads that to pin torn-free
        # version vectors across a pipeline chain.
        self.txn_app_id = f"{self.source_name}->{dest_stream}"
        # apply_deletes makes the hop a full CDC applier: delete rows
        # in the window remove their keys downstream via the
        # destination's file-pruned delete. Requires primary_keys and
        # a commit-log destination. The key list crosses the driver
        # (bounded by MAX_DELETE_KEYS — per-window deletes are
        # update-locality-sized, not table-sized; a larger purge
        # should run as its own delete_where on the destination).
        self.apply_deletes = apply_deletes
        if apply_deletes and not self.primary_keys:
            raise ValueError("apply_deletes requires primary_keys")
        # Bounded catch-up (Delta's maxFilesPerTrigger, in versions): a
        # follower resuming after a long outage would otherwise diff the
        # WHOLE backlog in one window — a union of one change-frame per
        # commit whose plan grows linearly with the gap. Capping the
        # window keeps each cycle's plan bounded; run() then drains the
        # backlog cycle by cycle. Each bounded window is exactly the
        # change set between two real snapshots, so every intermediate
        # destination state is a consistent AS-OF view, not a torn one.
        if max_versions_per_cycle is not None and max_versions_per_cycle < 1:
            raise ValueError("max_versions_per_cycle must be >= 1")
        self.max_versions_per_cycle = max_versions_per_cycle
        # Snapshot-diff catch-up: with the default transform the
        # follower only ever applies the FINAL per-key state of a
        # window, so the window collapses to ONE diff between the two
        # endpoint snapshots (store.diff_snapshots) — catch-up cost
        # O(data), not O(commits). A custom transform sees per-commit
        # granularity, so it forces the per-commit path; the store
        # itself falls back on rename/drop-in-window. False forces
        # per-commit replay even when the collapse would be safe.
        self.snapshot_diff = snapshot_diff

    # -- cursor -------------------------------------------------------------

    def processed_version(self) -> int:
        provider = self.dest_cache.get_state_provider(self.source_name)
        artifact = provider.get_stream_state(self.dest_stream)
        if artifact is None:
            return 0
        return int(artifact.state.get(self.CURSOR_KEY, 0))

    def _commit_cursor(self, version: int) -> None:
        writer = self.dest_cache.get_state_writer(self.source_name)
        writer.write_state(
            StateArtifact(self.dest_stream, {self.CURSOR_KEY: version})
        )
        writer.flush(self.dest_stream)

    # -- provenance / cross-table snapshot consistency ----------------------

    def source_version_at(self, dest_version: int | None = None) -> int:
        """The SOURCE version the destination's commit at
        ``dest_version`` (default: latest) was built from — read from
        the commit's SetTransaction watermark, which landed in the
        same atomic PUT as the data (the cursor state row, by
        contrast, commits after and can lag under a crash). 0 = that
        commit predates this follower's first processed window."""
        store = self.dest_cache._acid_store()
        table = self.dest_cache.table_name(self.dest_stream)
        if dest_version is None:
            dest_version = store.latest_version(table)
        man = store._read_manifest(table, dest_version)
        return int((man.get("txns") or {}).get(self.txn_app_id, 0))

    @staticmethod
    def consistent_snapshot(followers: "list[ChangeFeedFollower]"):
        """Version-vector pin across a follower CHAIN (ordered
        upstream → downstream, e.g. ``[raw→clean, clean→agg]``): pin
        the TAIL destination at its latest version, then walk upstream
        recording, for each hop, the source version its pinned
        destination was built from (:meth:`source_version_at`).

        Reading every table AS OF its pinned version yields a mutually
        CONSISTENT view however mid-update the pipeline is: each
        derived table reflects exactly its upstream's pinned snapshot
        — never ``clean`` v12 joined against an ``agg`` built from
        v11 (the torn read per-table atomicity alone cannot prevent).

        Returns ``(versions, snapshot)``: ``versions`` maps stream
        name → pinned version (including the root source);
        ``snapshot`` is a :class:`~pyairbyte_spark.writers
        .StoreSnapshot` over those versions when every hop lives in
        one store (the common case), else None — read through each
        hop's own cache with ``read_stream_version`` then. Raises if a
        hop has never completed a cycle (no provenance recorded yet)
        or the chain's hops don't link dest→source."""
        if not followers:
            raise ValueError("consistent_snapshot needs at least one hop")
        for up, down in zip(followers, followers[1:]):
            if up.dest_stream != down.source_stream:
                raise ValueError(
                    f"chain break: hop {up.dest_stream!r} does not feed "
                    f"{down.source_stream!r}"
                )
        tail = followers[-1]
        tail_store = tail.dest_cache._acid_store()
        versions: dict[str, int] = {
            tail.dest_stream: tail_store.latest_version(
                tail.dest_cache.table_name(tail.dest_stream)
            )
        }
        for f in reversed(followers):
            sv = f.source_version_at(versions[f.dest_stream])
            if sv <= 0:
                raise ValueError(
                    f"hop {f.source_stream!r}→{f.dest_stream!r} has no "
                    "recorded provenance yet (run process_once first)"
                )
            versions[f.source_stream] = sv
        stores = {
            id(f.source_cache._acid_store()) for f in followers
        } | {id(f.dest_cache._acid_store()) for f in followers}
        snapshot = None
        if len(stores) == 1:
            store = tail.dest_cache._acid_store()
            table_versions = {}
            for f in followers:
                table_versions[
                    f.source_cache.table_name(f.source_stream)
                ] = versions[f.source_stream]
                table_versions[
                    f.dest_cache.table_name(f.dest_stream)
                ] = versions[f.dest_stream]
            snapshot = store.snapshot(table_versions)
        return versions, snapshot

    # -- processing ---------------------------------------------------------

    def _default_transform(self, changes: DataFrame) -> DataFrame:
        """Forward change rows as-is; :meth:`process_once` routes
        deletes, reduces to final-per-key state, and strips the feed
        columns AFTER the transform, so a custom transform only needs
        to reshape values — keep ``_change_type``/``_commit_version``
        in its output to retain that machinery (dropping them takes
        window ordering into the transform's own hands)."""
        return changes

    def _finalize_window(self, out: DataFrame) -> DataFrame:
        """CDC-applier semantics on the (possibly transformed) window:
        drop delete rows from the forward path (deletes are routed by
        ``apply_deletes``), keep only the LAST change per key by commit
        version, and strip the feed columns.

        The per-key reduction is what makes the hop converge: one
        window can carry several upserts for the SAME key at different
        versions, and only the last is the state at the window's end.
        The destination merge alone cannot recover that order — it
        tie-breaks on extracted-at, and a RESTORE re-inserts the
        ORIGINAL row with its ORIGINAL (older) timestamp, so the
        rolled-back value would lose to the very value it displaces."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        if "_change_type" in out.columns:
            out = out.filter(F.col("_change_type") != "delete")
        if "_commit_version" in out.columns and self.primary_keys:
            w = Window.partitionBy(*self.primary_keys).orderBy(
                F.col("_commit_version").desc()
            )
            out = (
                out.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        return out.drop("_change_type", "_commit_version")

    def process_once(self) -> dict:
        """Process one change window; returns
        ``{"from_version", "to_version", "rows"}`` (rows=0 → caught up).
        """
        store = self.source_cache._acid_store()
        table = self.source_cache.table_name(self.source_stream)
        latest = store.latest_version(table)
        done = self.processed_version()
        if latest <= done:
            return {
                "from_version": done,
                "to_version": done,
                "rows": 0,
                **({"deleted": 0} if self.apply_deletes else {}),
            }
        if self.max_versions_per_cycle is not None:
            latest = min(latest, done + self.max_versions_per_cycle)
        changes = None
        if self.snapshot_diff and self.transform is None and self.primary_keys:
            changes = store.diff_snapshots(
                table, done, latest, self.primary_keys
            )
        if changes is None:  # custom transform, or unsafe to collapse
            changes = store.read_changes(table, done, latest)
        if self.apply_deletes:
            # The delete scan (#3 below) re-reads the window's change
            # set on top of the count and the destination write;
            # materialize the diff/CDF scan once so all three read the
            # same blocks (bounded by the window's change rows, spills
            # to disk past memory).
            changes = changes.localCheckpoint(eager=False)
        out = (
            self.transform(changes)
            if self.transform is not None
            else self._default_transform(changes)
        )
        out = self._finalize_window(out)
        # Re-stamp extraction time at APPLY time: the destination's
        # merge is latest-wins on _airbyte_extracted_at, and a window
        # can carry rows whose original stamp is OLDER than what the
        # destination already holds — a RESTORE re-inserts rows with
        # their original timestamps, so the rolled-back value would
        # lose to the very value it displaces. For this hop the window
        # IS the extraction: its end-state is authoritative for every
        # key it touches. Replays after a crash re-stamp again, so the
        # merge destination still converges.
        from pyspark.sql import functions as F

        from pyairbyte_spark.records import AB_EXTRACTED_AT_COLUMN

        if AB_EXTRACTED_AT_COLUMN in out.columns:
            out = out.withColumn(AB_EXTRACTED_AT_COLUMN, F.current_timestamp())
        from pyairbyte_spark.writers import CommitLogTableStore

        # The row count and the destination write both consume ``out``
        # — without a checkpoint each re-runs the whole window plan
        # (diff/CDF scan + the final-per-key window), and a merge
        # destination reads the source frame again for touched-bucket
        # discovery. One lazy materialization; the count below
        # triggers it, every later consumer reads the blocks.
        out = out.localCheckpoint(eager=False)
        rows = out.count()
        if rows:
            # 1. destination data commit — carrying the txn watermark
            # (this window's end version) when the destination can:
            # a crash-replayed window SKIPS instead of re-merging, and
            # the commit itself records its source-version provenance.
            # A plain parquet destination keeps the pre-txn contract
            # (merge converges under replay).
            self.dest_cache.write_dataframe(
                out,
                self.dest_stream,
                self.method,
                self.primary_keys,
                txn=(
                    (self.txn_app_id, latest)
                    if isinstance(self.dest_cache.store, CommitLogTableStore)
                    else None
                ),
            )
        deleted = 0
        if self.apply_deletes:
            deleted = self._apply_deletes(changes)
        # 2. … THEN the cursor. Crash between the two replays this
        # window; merge destinations converge and the key-delete is
        # idempotent (re-deleting absent keys is a no-op).
        self._commit_cursor(latest)
        return {
            "from_version": done,
            "to_version": latest,
            "rows": rows,
            **({"deleted": deleted} if self.apply_deletes else {}),
        }

    def _apply_deletes(self, changes: DataFrame) -> int:
        """Delete downstream only the keys whose FINAL change in the
        window is a delete. A key deleted at version v then
        re-inserted at v' > v must survive, and a replace commit emits
        delete+insert for the same key at ONE version — the insert
        wins there too (strict ``>`` below), matching the source
        snapshot at the window's end."""
        from pyspark.sql import functions as F

        pks = list(self.primary_keys)
        del_v = (
            changes.filter(F.col("_change_type") == "delete")
            .groupBy(*pks)
            .agg(F.max("_commit_version").alias("__del_v"))
        )
        ups_v = (
            changes.filter(F.col("_change_type") != "delete")
            .groupBy(*pks)
            .agg(F.max("_commit_version").alias("__ups_v"))
        )
        keys = (
            del_v.join(ups_v, pks, "left")
            .filter(
                F.col("__ups_v").isNull()
                | (F.col("__del_v") > F.col("__ups_v"))
            )
            .select(*pks)
            .limit(self.MAX_DELETE_KEYS + 1)
            .collect()
        )
        if not keys:
            return 0
        if len(keys) > self.MAX_DELETE_KEYS:
            raise ValueError(
                f"change window deletes more than {self.MAX_DELETE_KEYS} "
                "keys; run the purge directly on the destination with "
                "delete_stream_where instead of through the follower"
            )
        dest_table = self.dest_cache.table_name(self.dest_stream)
        dest_store = self.dest_cache._acid_store()
        if not dest_store.table_exists(dest_table):
            return 0
        if len(self.primary_keys) == 1:
            pk = self.primary_keys[0]
            preds = [(pk, "in", [k[0] for k in keys])]
            res = dest_store.delete_where(dest_table, preds)
        else:
            # composite key: OR of per-key conjunctions (DNF)
            dnf = [
                [(pk, "=", row[pk]) for pk in self.primary_keys]
                for row in keys
            ]
            res = dest_store.delete_where(dest_table, dnf)
        return int(res.get("deleted_rows") or 0)

    def run(
        self,
        *,
        poll_interval: float = 1.0,
        max_cycles: int | None = None,
        stop_when_caught_up: bool = False,
    ) -> list[dict]:
        """Polling loop around :meth:`process_once`."""
        results = []
        cycles = 0
        while True:
            res = self.process_once()
            results.append(res)
            cycles += 1
            if max_cycles is not None and cycles >= max_cycles:
                break
            # caught up = a true no-op cycle. With bounded windows a
            # cycle can process 0 rows yet still advance the cursor
            # (metadata-only commits in the window) while backlog
            # remains — only a non-advancing cycle means drained.
            if (
                stop_when_caught_up
                and res["rows"] == 0
                and res["to_version"] == res["from_version"]
            ):
                break
            time.sleep(poll_interval)
        return results
