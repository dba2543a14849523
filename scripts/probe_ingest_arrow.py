#!/usr/bin/env python
"""VERDICT r15 #6 probe: batched Arrow (parquet) staging for ingest
vs the reference-shape JSONL staging, behind the processor seam.

Arm A (current): per-record orjson -> gzip JSONL stripes ->
spark.read.json(schema).
Arm B (probe): per-record dict append -> per-batch pyarrow column
extraction -> parquet stripes -> spark.read.parquet. Only valid for
flat all-string declared schemas (the benchmark source's shape);
anything else keeps JSONL.

Adoption bar (VERDICT #6): >1.3x rec/s AND byte-identical warehouse
state. Prints per-arm rec/s and a warehouse-content comparison
(per-file row-order-sensitive content hash + file names + row counts).

Usage: python scripts/probe_ingest_arrow.py [num_records] [rounds]
"""

from __future__ import annotations

import hashlib
import os
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

N = int(float(sys.argv[1])) if len(sys.argv) > 1 else 500_000
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def make_arrow_processor():
    """Subclass staging parquet stripes instead of gzip JSONL."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyairbyte_spark.names import LowerCaseNormalizer
    from pyairbyte_spark.processor import MessageStreamProcessor, _StreamBuffer
    from pyairbyte_spark.records import conform_to_schema, with_metadata_columns
    from pyairbyte_spark.types import json_schema_to_struct

    class ArrowStagingProcessor(MessageStreamProcessor):
        def _write_record(self, stream_key, data):
            buf = self._buffer(stream_key)
            if buf.writers is None:
                os.makedirs(self._staging, exist_ok=True)
                buf.writers = [[] for _ in range(self.stripes)]  # dict lists
                buf.pending = [[] for _ in range(self.stripes)]  # seqs
                buf.active_count = 0
            key_map = self._key_map(stream_key, tuple(data))
            normalized = (
                data if key_map is None else {v: data[k] for k, v in key_map.items()}
            )
            i = buf.active_count % self.stripes
            buf.writers[i].append(normalized)
            buf.pending[i].append(buf.record_count)
            progress = self.progress
            if progress is not None:
                if progress.first_record_time is None:
                    progress.first_record_time = time.monotonic()
                buf.unreported_records += 1
                buf.unreported_bytes += 64
            buf.active_count += 1
            buf.record_count += 1
            if buf.active_count >= self.batch_size:
                self._rotate(stream_key, buf)

        def _rotate(self, stream_key, buf):
            if self.progress is not None and buf.unreported_records:
                self.progress.record_read(
                    stream_key,
                    n=buf.unreported_records,
                    n_bytes=buf.unreported_bytes,
                )
                buf.unreported_records = buf.unreported_bytes = 0
            if buf.writers is None:
                return
            spec = self.specs.get(stream_key)
            cols = list(spec.json_schema["properties"]) if spec else None
            for i, (dicts, seqs) in enumerate(zip(buf.writers, buf.pending)):
                if not dicts:
                    continue
                path = os.path.join(
                    self._staging,
                    f"{stream_key}_{buf.file_seq:05d}_{i:02d}.parquet",
                )
                buf.files.append(path)
                buf.file_seq += 1
                arrays = [
                    pa.array([d.get(c) for d in dicts], type=pa.string())
                    for c in cols
                ] + [pa.array(seqs, type=pa.int64())]
                pq.write_table(
                    pa.Table.from_arrays(arrays, names=cols + ["_airbyte_seq"]),
                    path,
                    compression="snappy",
                )
            buf.writers = None
            buf.pending = None
            buf.active_count = 0

        def _finalize_stream(self, stream_key):
            # Same as the base finalize but reading parquet staging.
            buf = self._buffers.get(stream_key)
            if not (buf and buf.record_count):
                return super()._finalize_stream(stream_key)
            self._rotate(stream_key, buf)
            from pyairbyte_spark.catalog import StreamSpec
            from pyairbyte_spark.constants import AB_INTERNAL_COLUMNS
            from pyairbyte_spark.strategies import (
                WriteMethod,
                resolve_write_method,
            )

            spec = self.specs.get(stream_key) or StreamSpec(name=stream_key)
            struct = json_schema_to_struct(
                spec.json_schema, normalizer=LowerCaseNormalizer
            )
            df = self.cache.spark.read.schema(
                struct.add("_airbyte_seq", "long")
            ).parquet(*buf.files)
            df = with_metadata_columns(df, seq_col="_airbyte_seq")
            df = conform_to_schema(
                df,
                spec.declared_columns
                or [c for c in df.columns if c not in AB_INTERNAL_COLUMNS],
            )
            method = resolve_write_method(
                self.write_strategy,
                has_primary_keys=bool(spec.primary_keys),
                has_cursor=bool(spec.cursor_field),
            )
            if stream_key in self.results and method == WriteMethod.REPLACE:
                method = WriteMethod.APPEND
            self.cache.write_dataframe(
                df,
                stream_key,
                method,
                spec.normalized_primary_keys,
                txn_group=self._txn_group,
            )
            self.cache.register_stream(spec)
            record_count = buf.record_count
            if not self.atomic:
                self._pending_state.finalize_stream(stream_key, self.state_writer)
                if hasattr(self.state_writer, "flush"):
                    self.state_writer.flush(stream_key)
            from pyairbyte_spark.processor import StreamWriteResult

            buf.files = []
            buf.record_count = 0
            prev = self.results.get(stream_key)
            self.results[stream_key] = StreamWriteResult(
                stream_name=stream_key,
                record_count=(prev.record_count if prev else 0) + record_count,
            )

    return ArrowStagingProcessor


def warehouse_digest(td):
    """Row-order-sensitive content hash per data file, plus names."""
    out = []
    for root, _dirs, files in os.walk(td):
        for f in sorted(files):
            if not f.endswith(".parquet") or "_staging" in root:
                continue
            import pyarrow.parquet as pq

            t = pq.read_table(os.path.join(root, f))
            h = hashlib.md5()
            for batch in t.to_batches():
                h.update(str(batch.to_pydict()).encode())
            out.append((os.path.relpath(os.path.join(root, f), td), t.num_rows, h.hexdigest()))
    return sorted(out)


def main():
    from pyairbyte_spark import SparkCache, get_spark
    from pyairbyte_spark import processor as proc_mod
    from pyairbyte_spark.sources.benchmark import BenchmarkSource

    spark = get_spark(
        "probe-ingest-arrow",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    ArrowP = make_arrow_processor()

    def run(arrow: bool):
        with tempfile.TemporaryDirectory() as td:
            cache = SparkCache(spark, td)
            src = BenchmarkSource(N)
            from pyairbyte_spark.sources import base as src_base

            orig = src_base.MessageStreamProcessor
            if arrow:
                src_base.MessageStreamProcessor = ArrowP
            try:
                t0 = time.monotonic()
                src.read(cache, write_strategy="append")
                dt = time.monotonic() - t0
            finally:
                src_base.MessageStreamProcessor = orig
            return dt, warehouse_digest(td)

    # warm both arms
    run(False)
    run(True)
    digests = {}
    for r in range(ROUNDS):
        ta, da = run(False)
        tb, db = run(True)
        digests = (da, db)
        print(
            f"round{r} JSONL={ta:.2f}s ({N/ta:,.0f} rec/s)  "
            f"ARROW={tb:.2f}s ({N/tb:,.0f} rec/s)  ratio={ta/tb:.2f}x",
            flush=True,
        )
    da, db = digests
    same = da == db
    print(f"warehouse identical (files x rows x content-hash): {same}")
    if not same:
        print("JSONL:", da[:4])
        print("ARROW:", db[:4])


if __name__ == "__main__":
    main()
