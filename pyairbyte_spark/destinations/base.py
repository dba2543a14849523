"""Destination write path — reverse ETL (§3.3 of SURVEY.md).

Parity with ``Destination.write`` (``airbyte/destinations/base.py:125-363``):

- data path A: source → cache → replay cached tables to the destination,
- data path B (cache=False): direct passthrough of the live message
  stream,
- data path C: replay an existing ReadResult / cache,
- four state channels: cache state + destination state readers,
  coalesced via :class:`JoinedStateProvider`; STATE confirmations coming
  back from the destination process land in the destination state
  writer (``:354-355``).

The destination itself is an external Airbyte-protocol process hosted by
:class:`SubprocessHost` (stdin pump thread + stdout drain — the
deadlock-avoidance shape of ``_executors/base.py:36-102``). For
in-process sinks (tests / Spark-native targets) a callable sink can be
substituted.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable, Iterator

from pyairbyte_spark.cache import SparkCache
from pyairbyte_spark.callbacks import extract_updated_config
from pyairbyte_spark.results import ReadResult, WriteResult
from pyairbyte_spark.sources.base import SparkSource
from pyairbyte_spark.sources.messages import (
    AirbyteMessage,
    AirbyteMessageIterator,
    encode_record,
    encode_state,
    encode_stream_status,
    parse_message,
)
from pyairbyte_spark.sources.subprocess_host import SubprocessHost
from pyairbyte_spark.state import JoinedStateProvider, StateArtifact, StateProvider
from pyairbyte_spark.strategies import WriteStrategy


def _hadoop_fs(spark, path_str: str):
    """Resolve (FileSystem, Path) for any Hadoop-supported scheme
    (file://, hdfs://, s3a://, dbfs:/ ...) via the JVM gateway."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _read_epoch_marker(spark, epoch_file: str) -> int:
    """Committed-epoch marker read through the Hadoop FileSystem API so
    it co-locates with the Spark checkpoint on whatever filesystem the
    checkpointLocation lives on (a driver-local ``open()`` would break
    epoch idempotence for hdfs/s3/dbfs checkpoints and driver restarts
    on another node)."""
    try:
        fs, hpath = _hadoop_fs(spark, epoch_file)
        if not fs.exists(hpath):
            return -1
        jvm = spark._jvm
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(fs.open(hpath))
        )
        try:
            line = reader.readLine()
        finally:
            reader.close()
        return int(line.strip()) if line else -1
    except Exception:
        return -1


def _commit_epoch_marker(spark, epoch_file: str, epoch_id: int) -> None:
    """Write-temp-then-rename through the Hadoop FileSystem API. Hadoop
    rename won't clobber, so the stale target is deleted first; a crash
    in the tiny delete→rename window just loses the marker, degrading
    that one restart to at-least-once for the last batch — never a torn
    read."""
    fs, target = _hadoop_fs(spark, epoch_file)
    jvm = spark._jvm
    tmp = jvm.org.apache.hadoop.fs.Path(epoch_file + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(str(epoch_id).encode("ascii")))
    finally:
        out.close()
    if fs.exists(target):
        fs.delete(target, False)
    if not fs.rename(tmp, target):
        raise OSError(f"could not commit epoch marker {epoch_file}")


def _encode_messages(messages: Iterable[AirbyteMessage]) -> Iterator[str]:
    for m in messages:
        if m.type == "RECORD" and m.record is not None:
            yield encode_record(m.record.stream, m.record.data, m.record.emitted_at)
        elif m.type == "STATE" and m.state is not None and m.state.stream_name:
            yield encode_state(m.state.stream_name, m.state.state)
        elif m.type == "TRACE" and m.trace is not None and m.trace.stream_name:
            yield encode_stream_status(
                m.trace.stream_name, m.trace.status or "COMPLETE"
            )
        elif m.raw is not None:
            yield json.dumps(m.raw, default=str)


class SparkDestination:
    """Host for an Airbyte-protocol destination connector."""

    name: str = "spark-destination"

    def __init__(
        self,
        executor: SubprocessHost | None = None,
        *,
        name: str | None = None,
        config: dict | None = None,
        sink: Callable[[Iterator[str]], Iterator[str]] | None = None,
        config_change_callback: Callable[[dict], None] | None = None,
    ) -> None:
        """Either ``executor`` (external process) or ``sink`` (an
        in-process callable taking/returning protocol JSONL lines —
        the returned lines are STATE confirmations)."""
        if (executor is None) == (sink is None):
            raise ValueError("provide exactly one of executor / sink")
        self.executor = executor
        self.sink = sink
        if name:
            self.name = name
        self.config = config or {}
        self.config_change_callback = config_change_callback

    # -- §3.3 entry point ---------------------------------------------------

    def write(
        self,
        source_data: SparkSource | ReadResult | SparkCache,
        *,
        cache: SparkCache | None = None,
        state_cache: SparkCache | None = None,
        write_strategy: WriteStrategy | str = WriteStrategy.AUTO,
        force_full_refresh: bool = False,
        streams: list[str] | None = None,
        source_name: str | None = None,
    ) -> WriteResult:
        """Pump source data into the destination; returns a
        :class:`WriteResult` — iterable over the STATE confirmations
        collected from the destination's stdout, with the
        delivered-record tally."""
        state_store = state_cache or cache

        # Resolve the message stream (paths A/B/C).
        if isinstance(source_data, SparkSource):
            source = source_data
            if cache is not None:
                # Path A: read to cache first, then replay.
                result = source.read(
                    cache,
                    write_strategy=write_strategy,
                    force_full_refresh=force_full_refresh,
                )
                messages = AirbyteMessageIterator.from_read_result(
                    cache, result.processed_streams, source_name=source.name
                )
            else:
                # Path B: direct passthrough, state from destination store.
                state: StateProvider | None = None
                if state_store is not None and not force_full_refresh:
                    state = JoinedStateProvider(
                        state_store.get_destination_state_provider(self.name),
                        state_store.get_state_provider(source.name),
                    )
                specs = source.configured_specs()
                messages = source.generate_messages(list(specs), state)
        elif isinstance(source_data, ReadResult):
            # Path C: replay a previous read's streams.
            messages = AirbyteMessageIterator.from_read_result(
                source_data.cache,
                streams or source_data.processed_streams,
                source_name=source_data.source_name,
            )
        elif isinstance(source_data, SparkCache):
            # Bare-cache replay has no ReadResult to learn the source
            # scope from; callers pass source_name= to replay STATE.
            messages = AirbyteMessageIterator.from_read_result(
                source_data,
                streams or source_data.stream_names,
                source_name=source_name,
            )
        else:  # pragma: no cover
            raise TypeError(f"unsupported source_data: {type(source_data)}")

        confirmations, n_records = self._write_message_stream(messages, state_store)
        return WriteResult(
            destination=self,
            confirmations=confirmations,
            processed_records=n_records,
            state_store=state_store,
        )

    def stream(
        self,
        stream_df,
        *,
        stream_name: str,
        checkpoint_dir: str,
        state_store: SparkCache | None = None,
        available_now: bool = True,
        distributed: bool = False,
    ):
        """Streaming reverse ETL: each micro-batch is pumped into the
        destination connector as one protocol conversation (records +
        an epoch STATE + stream-success trace), with epoch-idempotent
        delivery — a replayed epoch (restart re-delivers the last
        uncommitted batch) is skipped, so the destination sees each
        batch at most once per checkpoint line. Completes the §3.3
        reverse-ETL surface for Structured Streaming inputs; the batch
        paths A/B/C stay on :meth:`write`.

        ``distributed=True`` delivers each micro-batch through
        :meth:`write_distributed` — one connector subprocess per
        partition on the executors — instead of the driver-pumped
        single process; epoch idempotence is unchanged.
        """
        import posixpath

        from pyairbyte_spark.sources.messages import (
            RecordMessage,
            StateMessage,
            TraceMessage,
        )

        spark = stream_df.sparkSession
        fs, ckpt = _hadoop_fs(spark, checkpoint_dir)
        fs.mkdirs(ckpt)
        epoch_file = posixpath.join(checkpoint_dir, "_dest_committed_epoch")

        def handle(batch_df, epoch_id: int) -> None:
            sess = batch_df.sparkSession
            if epoch_id <= _read_epoch_marker(sess, epoch_file):
                return  # replayed epoch — already delivered
            if distributed:
                self.write_distributed(
                    batch_df, stream_name=stream_name, state_store=state_store
                )
                _commit_epoch_marker(sess, epoch_file, epoch_id)
                return

            def messages() -> Iterator[AirbyteMessage]:
                for row in batch_df.toLocalIterator():
                    yield AirbyteMessage(
                        "RECORD",
                        record=RecordMessage(stream_name, row.asDict(recursive=True)),
                    )
                yield AirbyteMessage(
                    "STATE",
                    state=StateMessage(
                        stream_name=stream_name, state={"epoch": epoch_id}
                    ),
                )
                yield AirbyteMessage(
                    "TRACE",
                    trace=TraceMessage(
                        trace_type="STREAM_STATUS",
                        stream_name=stream_name,
                        status="COMPLETE",
                    ),
                )

            self._write_message_stream(messages(), state_store)
            _commit_epoch_marker(sess, epoch_file, epoch_id)

        writer = stream_df.writeStream.foreachBatch(handle).option(
            "checkpointLocation", posixpath.join(checkpoint_dir, "spark")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def write_distributed(
        self,
        df,
        *,
        stream_name: str,
        num_processes: int | None = None,
        state_store: SparkCache | None = None,
    ) -> list[StateArtifact]:
        """Partition-parallel reverse ETL: one connector subprocess PER
        PARTITION, each fed its partition's rows directly on the executor.

        :meth:`write` is exact protocol parity with the reference — a
        single connector process fed through the driver — which caps
        throughput at one stdin pipe. This is the Spark-native upgrade
        the single-process protocol can't express: the record envelopes
        are built JVM-side (``to_json(struct(...))``, no Python in the
        encode path) and ``mapPartitions`` hosts an independent
        connector process on every partition, so delivery bandwidth
        scales with the cluster. Only STATE confirmations (bounded: a
        few lines per partition) return to the driver.

        Requires an argv-launchable executor (``SubprocessHost``); the
        in-process ``sink=`` form has no meaning across executors.
        """
        from pyspark.sql import functions as F

        if self.executor is None:
            raise ValueError("write_distributed requires an executor-backed destination")
        from pyairbyte_spark.secrets import hydrate_secrets

        argv = list(self.executor.argv)
        config_json = json.dumps(hydrate_secrets(self.config))
        if num_processes is not None:
            df = df.repartition(num_processes)

        envelope = F.to_json(
            F.struct(
                F.lit("RECORD").alias("type"),
                F.struct(
                    F.lit(stream_name).alias("stream"),
                    F.struct(*[F.col(c) for c in df.columns]).alias("data"),
                    F.lit(0).alias("emitted_at"),
                ).alias("record"),
            )
        )
        lines_df = df.select(envelope.alias("line"))
        stream = stream_name

        def pump_partition(rows):
            import json as _json
            import os as _os
            import subprocess as _sp
            import tempfile as _tf
            import threading as _th

            from pyspark import TaskContext

            first = next(rows, None)
            if first is None:
                return  # empty partition: never launch a process
            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else -1
            with _tf.TemporaryDirectory(prefix="dest-dist-") as td:
                cfg = _os.path.join(td, "config.json")
                with open(cfg, "w") as f:
                    f.write(config_json)
                proc = _sp.Popen(
                    argv + ["write", "--config", cfg],
                    stdin=_sp.PIPE,
                    stdout=_sp.PIPE,
                    stderr=_sp.PIPE,
                    text=True,
                )
                confirmations: list[str] = []
                stderr_tail: list[str] = []

                def drain() -> None:
                    for line in proc.stdout:
                        confirmations.append(line.rstrip("\n"))

                def drain_err() -> None:
                    for line in proc.stderr:
                        stderr_tail.append(line)
                        if len(stderr_tail) > 50:
                            stderr_tail.pop(0)

                drainer = _th.Thread(target=drain, daemon=True)
                drainer.start()
                _th.Thread(target=drain_err, daemon=True).start()
                n = 0
                try:
                    for row in [first]:
                        proc.stdin.write(row.line + "\n")
                        n += 1
                    for row in rows:
                        proc.stdin.write(row.line + "\n")
                        n += 1
                    proc.stdin.write(
                        _json.dumps(
                            {
                                "type": "STATE",
                                "state": {
                                    "type": "STREAM",
                                    "stream": {
                                        "stream_descriptor": {"name": stream},
                                        "stream_state": {
                                            "partition": pid,
                                            "rows": n,
                                        },
                                    },
                                },
                            }
                        )
                        + "\n"
                    )
                    proc.stdin.write(
                        _json.dumps(
                            {
                                "type": "TRACE",
                                "trace": {
                                    "type": "STREAM_STATUS",
                                    "stream_status": {
                                        "stream_descriptor": {"name": stream},
                                        "status": "COMPLETE",
                                    },
                                },
                            }
                        )
                        + "\n"
                    )
                    proc.stdin.close()
                except BrokenPipeError:
                    pass
                rc = proc.wait()
                # stdout is closed once the process exits, so the drain
                # loop terminates — join without a timeout; a timed-out
                # join could return with `confirmations` still being
                # appended, silently dropping STATE artifacts.
                drainer.join()
                if rc != 0:
                    tail = "".join(stderr_tail[-20:])
                    raise RuntimeError(
                        f"destination connector exited {rc} in partition {pid}; "
                        f"stderr tail:\n{tail}"
                    )
            for line in confirmations:
                yield (pid, n, line)

        collected = lines_df.rdd.mapPartitions(pump_partition).collect()

        artifacts: list[StateArtifact] = []
        writer = (
            state_store.get_destination_state_writer(self.name)
            if state_store is not None
            else None
        )
        for pid, _n, line in collected:
            msg = parse_message(line)
            if msg is None or msg.type != "STATE" or msg.state is None:
                continue
            artifact = StateArtifact(
                stream_name=f"{msg.state.stream_name or stream}#p{pid}",
                state=msg.state.state,
                state_type=msg.state.state_type,
            )
            artifacts.append(artifact)
            if writer is not None:
                writer.write_state(artifact)
                writer.flush(artifact.key)
        return artifacts

    def _write_message_stream(
        self,
        messages: Iterable[AirbyteMessage],
        state_store: SparkCache | None,
    ) -> tuple[list[StateArtifact], int]:
        tally = {"records": 0}

        def counted(msgs: Iterable[AirbyteMessage]) -> Iterator[AirbyteMessage]:
            for m in msgs:
                if m.type == "RECORD":
                    tally["records"] += 1
                yield m

        lines = _encode_messages(counted(messages))
        if self.executor is not None:
            # Hydrate + serialize the destination config and pass its
            # path — the connector reads credentials from this file
            # (reference destinations/base.py:329-343). /dev/null here
            # would hand every external destination an empty config.
            import tempfile
            from pathlib import Path

            from pyairbyte_spark.secrets import hydrate_secrets

            with tempfile.TemporaryDirectory(prefix="dest-cfg-") as td:
                cfg = Path(td) / "config.json"
                cfg.write_text(json.dumps(hydrate_secrets(self.config)))
                out_lines = list(
                    self.executor.execute(
                        ["write", "--config", str(cfg)], stdin_lines=lines
                    )
                )
        else:
            out_lines = self.sink(lines)

        confirmations: list[StateArtifact] = []
        writer = (
            state_store.get_destination_state_writer(self.name)
            if state_store is not None
            else None
        )
        for line in out_lines:
            msg = parse_message(line)
            if msg is None:
                continue
            if msg.type == "CONTROL" and msg.raw is not None:
                # Destinations can also rotate their config mid-write
                # (reference _connector_base.py:425-434).
                new_config = extract_updated_config(msg.raw)
                if new_config is not None:
                    self.config = new_config
                    if self.config_change_callback is not None:
                        self.config_change_callback(new_config)
            if msg.type == "STATE" and msg.state is not None:
                artifact = StateArtifact(
                    stream_name=msg.state.stream_name or msg.state.state_type,
                    state=msg.state.state,
                    state_type=msg.state.state_type,
                )
                confirmations.append(artifact)
                if writer is not None:
                    writer.write_state(artifact)
                    writer.flush(artifact.key)
        return confirmations, tally["records"]
