"""Message-stream processor: RECORD/STATE/TRACE → warehouse tables.

The Spark-shaped equivalent of ``SqlProcessorBase.process_airbyte_messages``
(``airbyte/shared/sql_processor.py:305-378``) and ``write_stream_data``
(``:748-824``):

1. RECORD messages are normalized/pruned and buffered into gzip JSONL
   batch files, rotated every ``DEFAULT_BATCH_SIZE`` records (parity:
   ``airbyte/_writers/file_writers.py:33,161-231``).
2. STATE messages are buffered per stream — never finalized early (T2).
3. TRACE stream-status COMPLETE triggers that stream's finalization
   immediately (T7): batch files → ``spark.read.schema(...).json`` →
   metadata columns → write strategy → THEN state flush.

The JSONL staging keeps the connector boundary row-oriented (as the
reference does) while everything after ``spark.read.json`` is columnar.
On a cluster the staging dir lives on shared storage and the JSON load
parallelizes across executors (one task per batch file).
"""

from __future__ import annotations

import gzip
import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from typing import IO, Any

try:  # orjson fast path with stdlib fallback — parity with the
    # reference's JSONL writer (airbyte/_writers/jsonl.py:44-59)
    import orjson

    def _dumps(obj: dict) -> bytes:
        try:
            return orjson.dumps(obj)
        except TypeError:
            return json.dumps(obj, default=str).encode()

except ImportError:  # pragma: no cover

    def _dumps(obj: dict) -> bytes:
        return json.dumps(obj, default=str).encode()

from pyspark.sql import functions as F

from pyairbyte_spark.cache import SparkCache
from pyairbyte_spark.catalog import StreamSpec
from pyairbyte_spark.constants import AB_INTERNAL_COLUMNS, DEFAULT_BATCH_SIZE
from pyairbyte_spark.names import LowerCaseNormalizer

_MISSING = object()
from pyairbyte_spark.records import conform_to_schema, with_metadata_columns
from pyairbyte_spark.state import PendingStateBuffer, StateArtifact, StateWriterBase
from pyairbyte_spark.strategies import (
    WriteMethod,
    WriteStrategy,
    resolve_write_method,
)
from pyairbyte_spark.types import json_schema_to_struct


@dataclass
class _StreamBuffer:
    files: list[str] = field(default_factory=list)
    writers: list[IO[bytes]] | None = None
    pending: list[bytearray] | None = None
    active_count: int = 0
    record_count: int = 0
    # Monotonic across finalizes (files is cleared then) so late
    # batches never reuse a staged filename.
    file_seq: int = 0
    # Progress tallies accumulate here and flush to the tracker per
    # BATCH, not per record — two dict updates per 100k records
    # instead of 200k (the pump is the single-threaded hot path).
    unreported_records: int = 0
    unreported_bytes: int = 0


@dataclass
class StreamWriteResult:
    stream_name: str
    record_count: int


class MessageStreamProcessor:
    def __init__(
        self,
        cache: SparkCache,
        *,
        source_name: str,
        specs: dict[str, StreamSpec],
        write_strategy: WriteStrategy = WriteStrategy.AUTO,
        state_writer: StateWriterBase | None = None,
        batch_size: int = DEFAULT_BATCH_SIZE,
        progress=None,
        atomic: bool = False,
    ) -> None:
        self.cache = cache
        self.source_name = source_name
        self.specs = {LowerCaseNormalizer.normalize(k): v for k, v in specs.items()}
        self.write_strategy = write_strategy
        self.state_writer = state_writer or cache.get_state_writer(source_name)
        self.batch_size = batch_size
        # Stripe width for batch files (see _write_record); bounded so
        # tiny syncs don't scatter into many near-empty files.
        self.stripes = max(1, min(8, (os.cpu_count() or 4) // 4))
        self.progress = progress
        self._buffers: dict[str, _StreamBuffer] = {}
        self._key_maps: dict[tuple[str, tuple[str, ...]], dict[str, str] | None] = {}
        self._pending_state = PendingStateBuffer()
        self._staging = os.path.join(
            cache.warehouse_dir, "_staging", uuid.uuid4().hex[:12]
        )
        self.results: dict[str, StreamWriteResult] = {}
        # Atomic multi-stream sync: every stream's final write becomes
        # a multi-table-txn PREPARE and the whole sync flips visible
        # with ONE decision-file PUT (writers.MultiTableTxn). Trades
        # T7's mid-sync freshness (per-stream finalize on COMPLETE
        # traces) for all-or-nothing cross-stream consistency; state
        # finalization moves AFTER the decision so a crashed or
        # aborted sync replays in full.
        self.atomic = atomic
        # Holds the in-flight MultiTableTxn OBJECT during the atomic
        # end-of-stream finalization: streams stage through it with
        # DEFERRED slot claims (no stream's slot is held while later
        # streams run their Spark jobs; the claims are one PUT burst
        # inside commit()).
        self._txn_group = None
        self._completed: set[str] = set()
        if atomic:
            from pyairbyte_spark.writers import CommitLogTableStore

            if not isinstance(cache.store, CommitLogTableStore):
                raise NotImplementedError(
                    "atomic multi-stream sync needs the ACID store: "
                    'SparkCache(..., table_format="commitlog")'
                )

    # -- batching -----------------------------------------------------------

    def _buffer(self, stream_key: str) -> _StreamBuffer:
        # .get + explicit create, not setdefault: setdefault would
        # construct a throwaway _StreamBuffer on every call.
        buf = self._buffers.get(stream_key)
        if buf is None:
            buf = self._buffers[stream_key] = _StreamBuffer()
        return buf

    def _rotate(self, stream_key: str, buf: _StreamBuffer) -> None:
        if self.progress is not None and buf.unreported_records:
            self.progress.record_read(
                stream_key,
                n=buf.unreported_records,
                n_bytes=buf.unreported_bytes,
            )
            buf.unreported_records = buf.unreported_bytes = 0
        if buf.writers is not None:
            for w, pend in zip(buf.writers, buf.pending):
                if pend:
                    w.write(pend)
                w.close()
            buf.writers = None
            buf.pending = None
            buf.active_count = 0

    def _key_map(self, stream_key: str, keys: tuple[str, ...]) -> dict[str, str] | None:
        """Per-(stream, key-shape) rename/prune map, cached.

        Returns None when the record's keys are already normalized and
        declared — the fast path skips the per-record dict rebuild
        (the reference memoizes per-key lookups instead,
        ``airbyte/records.py:93-171``).
        """
        cached = self._key_maps.get((stream_key, keys), _MISSING)
        if cached is not _MISSING:
            return cached
        spec = self.specs.get(stream_key)
        declared = spec.json_schema.get("properties", {}) if spec else None
        norm = LowerCaseNormalizer.normalize
        if declared:
            wanted = {norm(k) for k in declared}
            mapping = {k: norm(k) for k in keys if norm(k) in wanted}
        else:
            mapping = {k: norm(k) for k in keys}
        identity = all(k == v for k, v in mapping.items()) and len(mapping) == len(keys)
        result = None if identity else mapping
        self._key_maps[(stream_key, keys)] = result
        return result

    def _write_record(self, stream_key: str, data: dict[str, Any]) -> None:
        buf = self._buffer(stream_key)
        if buf.writers is None:
            # Each 100k-record batch is striped over several gzip files:
            # gzip is non-splittable, so files = parallel JSON-parse
            # tasks on the Spark side. Lines are staged in a per-stripe
            # bytearray and pushed to the compressor in ~256 KiB chunks
            # (per-call gzip overhead dominates short-line writes).
            os.makedirs(self._staging, exist_ok=True)
            buf.writers = []
            buf.pending = []
            for i in range(self.stripes):
                path = os.path.join(
                    self._staging,
                    f"{stream_key}_{buf.file_seq:05d}_{i:02d}.jsonl.gz",
                )
                buf.files.append(path)
                buf.file_seq += 1
                buf.writers.append(gzip.open(path, "wb", compresslevel=1))
                buf.pending.append(bytearray())
        key_map = self._key_map(stream_key, tuple(data))
        normalized = (
            data if key_map is None else {v: data[k] for k, v in key_map.items()}
        )
        line = _dumps(normalized)
        # Arrival-sequence field, spliced into the serialized bytes (the
        # record dict may be caller-owned — don't mutate it). Folded into
        # the raw id at load so merge's latest-per-PK is deterministic
        # across stripes and batches.
        suffix = b',"_airbyte_seq":%d}' if line != b"{}" else b'"_airbyte_seq":%d}'
        pend = buf.pending[buf.active_count % self.stripes]
        pend += line[:-1]
        pend += suffix % buf.record_count
        pend += b"\n"
        progress = self.progress
        if progress is not None:
            # Counts flush per batch (_rotate); only the time-to-first-
            # record marker needs per-record granularity, and it is one
            # attribute test once set.
            if progress.first_record_time is None:
                progress.first_record_time = time.monotonic()
            buf.unreported_records += 1
            buf.unreported_bytes += len(line) + 1
        if len(pend) >= 262_144:
            buf.writers[buf.active_count % self.stripes].write(pend)
            del pend[:]
        buf.active_count += 1
        buf.record_count += 1
        if buf.active_count >= self.batch_size:
            self._rotate(stream_key, buf)

    # -- message pump -------------------------------------------------------

    def process_messages(self, messages) -> dict[str, StreamWriteResult]:
        for msg in messages:
            if msg.type == "RECORD" and msg.record is not None:
                # Progress (count + bytes) is tallied inside
                # _write_record — one call per record, not two.
                self._write_record(
                    LowerCaseNormalizer.normalize(msg.record.stream), msg.record.data
                )
            elif msg.type == "STATE" and msg.state is not None:
                key = (
                    LowerCaseNormalizer.normalize(msg.state.stream_name)
                    if msg.state.stream_name
                    else msg.state.state_type
                )
                self._pending_state.add(
                    StateArtifact(
                        stream_name=msg.state.stream_name or key,
                        state=msg.state.state,
                        state_type=msg.state.state_type,
                    )
                )
            elif (
                msg.type == "TRACE"
                and msg.trace is not None
                and msg.trace.trace_type == "STREAM_STATUS"
                and msg.trace.status in ("COMPLETE", "SUCCEEDED")
                and msg.trace.stream_name
            ):
                key = LowerCaseNormalizer.normalize(msg.trace.stream_name)
                if self.atomic:
                    # Deferred: finalizing now would prepare the table
                    # mid-sync and a later batch of the same stream
                    # would need a SECOND prepare of one table in one
                    # group (undefined). All prepares happen together
                    # at end of stream.
                    self._completed.add(key)
                else:
                    # T7: finalize this stream immediately.
                    self._finalize_stream(key)
        # End of stream: finalize everything left — including streams
        # that got MORE records after an early COMPLETE trace (those
        # have a non-empty buffer again; skipping them would silently
        # drop the late records).
        txn = self.cache.store.begin_txn() if self.atomic else None
        self._txn_group = txn
        try:
            for key in list(self._buffers) + sorted(
                self._completed - set(self._buffers)
            ):
                buf = self._buffers.get(key)
                if key not in self.results or (buf and buf.record_count):
                    self._finalize_stream(key)
        except BaseException:
            if txn is not None:
                txn.abort()  # nothing prepared ever becomes visible
            raise
        if txn is not None:
            txn.commit()  # the sync's single atomicity point
        self._pending_state.finalize_all(self.state_writer)
        if hasattr(self.state_writer, "flush"):
            self.state_writer.flush()
        shutil.rmtree(self._staging, ignore_errors=True)
        return self.results

    # -- finalization -------------------------------------------------------

    def _finalize_stream(self, stream_key: str) -> None:
        buf = self._buffers.get(stream_key)
        spec = self.specs.get(stream_key) or StreamSpec(name=stream_key)
        record_count = buf.record_count if buf else 0
        if buf and buf.record_count:
            self._rotate(stream_key, buf)
            struct = json_schema_to_struct(
                spec.json_schema, normalizer=LowerCaseNormalizer
            )
            reader = self.cache.spark.read
            if struct.fields:
                df = reader.schema(struct.add("_airbyte_seq", "long")).json(buf.files)
            else:
                df = reader.json(buf.files)
            df = with_metadata_columns(df, seq_col="_airbyte_seq")
            df = conform_to_schema(
                df,
                spec.declared_columns
                or [c for c in df.columns if c not in AB_INTERNAL_COLUMNS],
            )
            # A5 tallies, Spark-native: an Observation rides the write
            # job (no extra count() job) — parity with the reference's
            # progress counters (airbyte/progress.py:253-380).
            from pyspark.sql import Observation
            from pyspark.sql import functions as F

            obs = Observation(f"write_{stream_key}")
            df = df.observe(obs, F.count(F.lit(1)).alias("rows_written"))
            method = resolve_write_method(
                self.write_strategy,
                has_primary_keys=bool(spec.primary_keys),
                has_cursor=bool(spec.cursor_field),
            )
            if stream_key in self.results and method == WriteMethod.REPLACE:
                # Re-finalize (second COMPLETE trace / late records at
                # end of stream): the first finalize already REPLACEd
                # the table with the earlier batches, so replacing
                # again with ONLY the new batch files would delete
                # those committed rows. Late batches append.
                method = WriteMethod.APPEND
            self.cache.write_dataframe(
                df,
                stream_key,
                method,
                spec.normalized_primary_keys,
                txn_group=self._txn_group,
            )
            observed = obs.get.get("rows_written")
            if observed is not None:
                record_count = observed
            self.cache.register_stream(spec)
        elif spec is not None and spec.json_schema.get("properties"):
            # Empty stream: still materialize an empty table with the
            # declared schema (reference creates the final table even
            # when zero records arrive).
            struct = json_schema_to_struct(spec.json_schema, normalizer=LowerCaseNormalizer)
            empty = self.cache.spark.createDataFrame([], struct)
            empty = with_metadata_columns(empty)
            if not self.cache.store.table_exists(self.cache.table_name(stream_key)):
                self.cache.write_dataframe(
                    empty,
                    stream_key,
                    resolve_write_method(
                        WriteStrategy.REPLACE,
                        has_primary_keys=False,
                        has_cursor=False,
                    ),
                    txn_group=self._txn_group,
                )
            self.cache.register_stream(spec)
        # Data committed → NOW finalize state (T2 ordering). Under an
        # atomic sync the data is only PREPARED here — state moves
        # after the group decision (process_messages), same ordering
        # one level up.
        if not self.atomic:
            self._pending_state.finalize_stream(stream_key, self.state_writer)
            if hasattr(self.state_writer, "flush"):
                self.state_writer.flush(stream_key)
        if buf:
            # Consume the buffer: a later finalize (second COMPLETE
            # trace, or late records at end of stream) must only load
            # NEW batch files, never re-read these.
            buf.files = []
            buf.record_count = 0
        prev = self.results.get(stream_key)
        if prev is not None:
            record_count += prev.record_count
        self.results[stream_key] = StreamWriteResult(stream_key, record_count)
        if self.progress is not None:
            self.progress.stream_finalized(stream_key, record_count)
