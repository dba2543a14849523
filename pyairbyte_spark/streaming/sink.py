"""Streaming cache sink with state-after-data commit ordering.

``foreachBatch`` + epoch tracking gives the same crash-consistency
contract as the batch processor (T2): a micro-batch's data commit
happens first, the stream's state row second, and re-delivered epochs
(after a restart replays the last uncommitted batch) are skipped by
epoch id — at-least-once upgraded to effectively-once for the
idempotent write strategies (replace/merge), at-least-once for append.

Parity: the reference's sink is ``CacheBase._write_airbyte_message_stream``
(``airbyte/caches/base.py:457-477``); epochs play the role of batch
files, the stream-success trace becomes the query stop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pyairbyte_spark.cache import SparkCache
from pyairbyte_spark.records import with_metadata_columns
from pyairbyte_spark.state import StateArtifact
from pyairbyte_spark.strategies import WriteMethod


class CacheStreamingSink:
    def __init__(
        self,
        cache: SparkCache,
        stream_name: str,
        *,
        source_name: str = "streaming",
        method: WriteMethod = WriteMethod.APPEND,
        primary_keys: list[str] | None = None,
        cursor_col: str | None = None,
        expectations: dict | None = None,
        on_violation: str = "drop",
    ) -> None:
        self.cache = cache
        self.stream_name = stream_name
        self.source_name = source_name
        self.method = method
        self.primary_keys = primary_keys or []
        self.cursor_col = cursor_col
        # Per-micro-batch CHECK enforcement (expectations.py). The
        # streaming default is "drop" — "fail" kills the QUERY on one
        # bad record, which is rarely the wanted contract for an
        # unbounded source; quarantine lands rejects beside the data.
        self.expectations = expectations
        self.on_violation = on_violation
        self.violation_totals: dict[str, int] = {}

    def _committed_epoch(self) -> int:
        provider = self.cache.get_state_provider(self.source_name)
        artifact = provider.get_stream_state(self.stream_name)
        if artifact is None:
            return -1
        return int(artifact.state.get("epoch_id", -1))

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        """The foreachBatch body."""
        if epoch_id <= self._committed_epoch():
            return  # replayed epoch after restart → already committed
        data = with_metadata_columns(batch_df)
        # 1. data commit
        counts = self.cache.write_dataframe(
            data,
            self.stream_name,
            self.method,
            self.primary_keys,
            expectations=self.expectations,
            on_violation=self.on_violation,
        )
        if counts:
            for name, n in counts.items():
                self.violation_totals[name] = (
                    self.violation_totals.get(name, 0) + n
                )
        # 2. THEN state commit (cursor high-water mark + epoch id)
        state: dict = {"epoch_id": epoch_id}
        if self.cursor_col and self.cursor_col in batch_df.columns:
            from pyspark.sql import functions as F

            hwm = batch_df.agg(F.max(self.cursor_col)).collect()[0][0]
            if hwm is not None:
                state["cursor"] = str(hwm)
        writer = self.cache.get_state_writer(self.source_name)
        writer.write_state(StateArtifact(self.stream_name, state))
        writer.flush(self.stream_name)

    def attach(self, stream_df: DataFrame, *, checkpoint_dir: str, trigger_once: bool = True):
        """Start the streaming query writing through this sink."""
        w = stream_df.writeStream.foreachBatch(self).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_once:
            w = w.trigger(availableNow=True)
        return w.start()


class StoreStreamingSink:
    """Exactly-once streaming APPEND into a :class:`CommitLogTableStore`.

    The transaction watermark (Delta's ``SetTransaction`` pattern)
    rides the SAME atomic commit as the micro-batch's data —
    ``write_append(txn=(app_id, epoch_id))`` skips any epoch at or
    below the recorded watermark — so foreachBatch's at-least-once
    redelivery (the last epoch replays after a crash between the data
    write and Spark's own checkpoint advance) cannot duplicate rows.
    Unlike :class:`CacheStreamingSink`'s state-row epoch tracking
    (data commit first, state second — a crash BETWEEN them re-appends
    under WriteMethod.APPEND), there is no window: the skip decision
    and the data flip are one conditional PUT.

    ``app_id`` defaults to a name you pass explicitly; pin it per
    logical pipeline (restarts must reuse it — that IS the identity
    the watermark is keyed by).

    ``sync_indexes=True`` runs one :class:`~pyairbyte_spark.streaming
    .index_sync.IndexSyncFollower` tick after every APPLIED epoch —
    attached derived indexes (text/MinHash/IVF/PQ) follow the stream
    with no separate cadence job. Exactly-once composes for free: a
    replayed epoch skips the data append, so the tick never runs for
    it, and even a spurious tick is idempotent (the sync's own
    watermark CAS). A tick failure never fails the epoch (the data is
    already committed; the next tick catches up O(diff)) — it counts
    in ``sync_errors``.
    """

    def __init__(
        self,
        store,
        table_name: str,
        app_id: str,
        *,
        primary_keys: list[str] | None = None,
        sync_indexes: bool = False,
        sync_tombstone_max: "float | None" = 0.2,
    ) -> None:
        self.store = store
        self.table_name = table_name
        self.app_id = app_id
        self.primary_keys = primary_keys
        self.skipped_epochs = 0
        self.sync_errors = 0
        self._follower = None
        if sync_indexes:
            from pyairbyte_spark.streaming.index_sync import (
                IndexSyncFollower,
            )

            self._follower = IndexSyncFollower(
                store,
                source_table=table_name,
                tombstone_max=sync_tombstone_max,
            )

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        res = self.store.write_append(
            batch_df,
            self.table_name,
            self.primary_keys,
            txn=(self.app_id, int(epoch_id)),
        )
        if res and res.get("skipped"):
            self.skipped_epochs += 1
            return  # replayed epoch: nothing new for the indexes either
        if self._follower is not None:
            try:
                self._follower.process_once()
            except Exception:  # noqa: BLE001 — data already committed
                self.sync_errors += 1

    def attach(
        self,
        stream_df: DataFrame,
        *,
        checkpoint_dir: str,
        trigger_once: bool = True,
    ):
        """Start the streaming query writing through this sink."""
        w = stream_df.writeStream.foreachBatch(self).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_once:
            w = w.trigger(availableNow=True)
        return w.start()


class VectorIndexStreamingSink:
    """Exactly-once streaming maintenance of a persisted ANN index.

    Each micro-batch of vectors is encoded/assigned with the index's
    EXISTING quantizer (PQ codebooks or IVF centroids — training never
    runs on the hot path) and appended to the codes/lists table via
    ``write_append(txn=(app_id, epoch_id))``: the SetTransaction
    watermark rides the same atomic commit as the data, so a replayed
    epoch after a crash is skipped — the index is maintained EXACTLY
    ONCE while probes (``pq_index_topk`` / ``ivf_index_topk``) see
    each batch atomically. Stream-MAINTAINED indexes only
    (``build_pq_index``/``build_ivf_index``): pointing the sink at an
    ATTACHED index raises (r13 guard) — CDF-synced indexes are fed
    through their source table.

    Retrain cadence: appending against FROZEN quantizers serves a
    drifting distribution with rising quantization error and falling
    recall. Each PQ epoch's relative error rides the encode job's
    ``observe`` (``batch_quant_errs`` below, zero extra jobs);
    ``similarity.index_health(store, name)`` compares appended rows
    against the build corpus and trips ``retrain`` past the drift
    threshold — then rebuild with ``build_pq_index`` /
    ``build_ivf_index`` (one atomic swap; this sink keeps appending
    between retrains, and its app_id watermark survives the rebuild's
    REPLACE so replayed epochs still skip).
    """

    def __init__(
        self,
        store,
        index_name: str,
        app_id: str,
        *,
        kind: str = "pq",
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        if kind not in ("pq", "ivf"):
            raise ValueError(f"kind must be 'pq' or 'ivf', got {kind!r}")
        self.store = store
        self.index_name = index_name
        self.app_id = app_id
        self.kind = kind
        self.id_col = id_col
        self.vec_col = vec_col
        self.skipped_epochs = 0
        self.appended = 0
        # Per-epoch relative quantization error (PQ epochs; free —
        # rides the encode observation). index_health() is the
        # cross-restart / IVF-capable view of the same signal.
        self.batch_quant_errs: list[float] = []

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        from pyairbyte_spark.operators import similarity

        fn = (
            similarity.append_to_pq_index
            if self.kind == "pq"
            else similarity.append_to_ivf_index
        )
        res = fn(
            batch_df,
            self.store,
            self.index_name,
            id_col=self.id_col,
            vec_col=self.vec_col,
            txn=(self.app_id, int(epoch_id)),
        )
        if res.get("skipped"):
            self.skipped_epochs += 1
        else:
            self.appended += int(res.get("appended") or 0)
            if res.get("quant_err") is not None:
                self.batch_quant_errs.append(float(res["quant_err"]))

    def attach(
        self,
        stream_df: DataFrame,
        *,
        checkpoint_dir: str,
        trigger_once: bool = True,
    ):
        """Start the streaming query maintaining the index."""
        w = stream_df.writeStream.foreachBatch(self).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_once:
            w = w.trigger(availableNow=True)
        return w.start()


class MinHashIndexStreamingSink:
    """Exactly-once streaming maintenance of a persisted MinHash-LSH
    dedup index (``operators/dedup.py``): each micro-batch of
    documents is signatured with the index's STORED hash family and
    appended via ``append_to_minhash_index(txn=(app_id, epoch_id))`` —
    the bands and sigs tables move as ONE multi-table txn group, the
    SetTransaction watermark rides the group, and a replayed epoch
    after a crash skips BOTH tables together. Probes
    (``minhash_index_matches``) racing an epoch see the index move
    atomically — never bands without their signatures.

    This is dedup-at-ingest in its streaming form: the same sink that
    lands documents can fan a copy through here, and every later batch
    can ask "is this a near-dup of anything already ingested" in
    O(touched buckets).

    Stream-MAINTAINED indexes only (``build_minhash_index``): pointing
    the sink at an ATTACHED index raises (r13 guard) — CDF-synced
    indexes must be fed through their source table.

    ``refresh_coverage_min`` (0..1, default off) makes the sink
    self-maintaining: every epoch appends one unclustered entry, so
    probe pruning decays with stream lifetime; when the coverage
    watermark (pure manifest arithmetic, read AFTER the append — no
    extra Spark job) drops below the floor, the sink runs
    ``refresh_minhash_index`` — an O(appended tail) recluster, the
    streaming analogue of the ANN sink's drift-triggered retrain.
    Replayed epochs never trigger it (nothing was appended).
    """

    def __init__(
        self,
        store,
        index_name: str,
        app_id: str,
        *,
        refresh_coverage_min: float | None = None,
    ) -> None:
        self.store = store
        self.index_name = index_name
        self.app_id = app_id
        self.refresh_coverage_min = refresh_coverage_min
        self.skipped_epochs = 0
        self.appended_epochs = 0
        self.refreshes = 0

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        from pyairbyte_spark.operators import dedup

        res = dedup.append_to_minhash_index(
            batch_df,
            self.store,
            self.index_name,
            txn=(self.app_id, int(epoch_id)),
        )
        if res.get("skipped"):
            self.skipped_epochs += 1
            return
        self.appended_epochs += 1
        if self.refresh_coverage_min is not None:
            cov = dedup.minhash_index_coverage(self.store, self.index_name)
            if cov["coverage"] < self.refresh_coverage_min:
                dedup.refresh_minhash_index(self.store, self.index_name)
                self.refreshes += 1

    def attach(
        self,
        stream_df: DataFrame,
        *,
        checkpoint_dir: str,
        trigger_once: bool = True,
    ):
        w = stream_df.writeStream.foreachBatch(self).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_once:
            w = w.trigger(availableNow=True)
        return w.start()


class TextIndexStreamingSink:
    """Exactly-once streaming maintenance of a persisted inverted text
    index (``operators/search.py``): each micro-batch of documents
    appends postings + a stats delta as ONE atomic two-table txn group
    with the epoch riding as the SetTransaction watermark — a replayed
    epoch (foreachBatch redelivery after a crash) skips BOTH tables,
    so search results never double-count a document.

    ``refresh_coverage_min`` mirrors :class:`MinHashIndexStreamingSink`:
    every epoch lands one token-unclustered entry, decaying probe
    pruning; below the floor the sink reclusters the appended tail
    (O(tail)). Replayed epochs never trigger it.

    Stream-MAINTAINED indexes only (``build_text_index``): pointing
    the sink at an ATTACHED index raises (r13 guard) — CDF-synced
    indexes must be fed through their source table.
    """

    def __init__(
        self,
        store,
        index_name: str,
        app_id: str,
        *,
        refresh_coverage_min: float | None = None,
    ) -> None:
        self.store = store
        self.index_name = index_name
        self.app_id = app_id
        self.refresh_coverage_min = refresh_coverage_min
        self.skipped_epochs = 0
        self.appended_epochs = 0
        self.refreshes = 0

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        from pyairbyte_spark.operators import search

        res = search.append_to_text_index(
            batch_df,
            self.store,
            self.index_name,
            txn=(self.app_id, int(epoch_id)),
        )
        if res.get("skipped"):
            self.skipped_epochs += 1
            return
        self.appended_epochs += 1
        if self.refresh_coverage_min is not None:
            cov = search.text_index_coverage(self.store, self.index_name)
            if cov["coverage"] < self.refresh_coverage_min:
                search.refresh_text_index(self.store, self.index_name)
                self.refreshes += 1

    def attach(
        self,
        stream_df: DataFrame,
        *,
        checkpoint_dir: str,
        trigger_once: bool = True,
    ):
        w = stream_df.writeStream.foreachBatch(self).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_once:
            w = w.trigger(availableNow=True)
        return w.start()
