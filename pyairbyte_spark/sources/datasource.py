"""Airbyte-protocol connectors as a native PySpark DataSource.

The fully Spark-idiomatic form of the connector scan (SURVEY §2 S1):

    spark.dataSource.register(AirbyteProtocolDataSource)
    df = (spark.read.format("airbyte_protocol")
          .option("argv", "python /path/connector.py")
          .option("stream", "items")
          .schema("id long, name string")
          .load())

Each selected stream becomes one input partition, and the connector
subprocess runs ON THE EXECUTOR for its partition — the driver never
touches record bytes. With S streams the scan parallelizes S-wide; a
single giant stream still bottlenecks on one connector process, which
is the protocol's own serialization constraint (same in the reference —
its one-process stdout is the pipe).

Contrast with :class:`MessageStreamProcessor` (driver-side host used by
the sync/landing path, which needs strict STATE ordering): this
DataSource is the query-side scan — read a connector straight into a
DataFrame without landing it.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _StreamPartition(InputPartition):
    def __init__(self, stream_name: str):
        self.stream_name = stream_name


class AirbyteProtocolReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.argv = options.get("argv")
        if not self.argv:
            raise ValueError("option 'argv' (connector command) is required")
        self.streams = [
            s for s in (options.get("stream") or "").split(",") if s
        ]
        self.config = json.loads(options.get("config") or "{}")
        self.field_names = schema.fieldNames()

    def partitions(self):
        # One partition per selected stream; the executor-side read
        # re-filters on the partition's stream name.
        if not self.streams:
            return [_StreamPartition("")]
        return [_StreamPartition(s) for s in self.streams]

    def read(self, partition: _StreamPartition) -> Iterator[tuple]:
        # Runs on the executor: spawn the connector for this partition.
        import shlex

        from pyairbyte_spark.sources.connector import ConnectorSource
        from pyairbyte_spark.sources.subprocess_host import SubprocessHost

        host = SubprocessHost(shlex.split(self.argv))
        source = ConnectorSource(host, config=self.config)
        streams = (
            [partition.stream_name]
            if partition.stream_name
            else source.get_available_streams()
        )
        fields = self.field_names
        for msg in source.generate_messages(streams, None):
            if msg.type == "RECORD" and msg.record is not None:
                data = msg.record.data
                yield tuple(data.get(f) for f in fields)


class AirbyteProtocolStreamReader(SimpleDataSourceStreamReader):
    """Incremental connector reads as a Structured Streaming source.

    Spark's offset IS the Airbyte state artifact: each micro-batch runs
    one ``read --state <offset>`` against the connector, emits the new
    records, and advances the offset to the final STATE message — the
    T1 cursor / T2 state-after-data contract expressed in the engine's
    own offset log (checkpointing, replay, and exactly-once-per-batch
    bookkeeping come from Structured Streaming for free).

    ``readBetweenOffsets`` replays by re-running the read from the
    start offset — at-least-once on replay, the same guarantee the
    reference's state machine gives (SURVEY §2.9 T2).
    """

    def __init__(self, schema, options):
        self.schema = schema
        self.argv = options.get("argv")
        if not self.argv:
            raise ValueError("option 'argv' (connector command) is required")
        self.streams = [s for s in (options.get("stream") or "").split(",") if s]
        self.config = json.loads(options.get("config") or "{}")
        self.field_names = schema.fieldNames()

    def initialOffset(self) -> dict:
        return {"state": []}

    def _run_read(self, start: dict):
        import shlex

        from pyairbyte_spark.sources.connector import ConnectorSource
        from pyairbyte_spark.sources.subprocess_host import SubprocessHost
        from pyairbyte_spark.state import StateArtifact, StaticInputState

        host = SubprocessHost(shlex.split(self.argv))
        source = ConnectorSource(host, config=self.config)
        streams = self.streams or source.get_available_streams()
        provider = StaticInputState(
            [StateArtifact.from_dict(d) for d in start.get("state") or []]
        )
        rows: list[tuple] = []
        latest: dict[str, dict] = {
            a["stream_name"]: a for a in (start.get("state") or [])
        }
        fields = self.field_names
        for msg in source.generate_messages(streams, provider):
            if msg.type == "RECORD" and msg.record is not None:
                data = msg.record.data
                rows.append(tuple(data.get(f) for f in fields))
            elif msg.type == "STATE" and msg.state is not None:
                art = StateArtifact(
                    stream_name=msg.state.stream_name or msg.state.state_type,
                    state=msg.state.state,
                    state_type=msg.state.state_type,
                )
                latest[art.stream_name] = art.to_dict()
        return rows, {"state": sorted(latest.values(), key=lambda d: d["stream_name"])}

    def read(self, start: dict):
        rows, end = self._run_read(start)
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        rows, _ = self._run_read(start)
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass


class AirbyteProtocolDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "airbyte_protocol"

    def reader(self, schema) -> AirbyteProtocolReader:
        return AirbyteProtocolReader(schema, self.options)

    def simpleStreamReader(self, schema) -> AirbyteProtocolStreamReader:
        return AirbyteProtocolStreamReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(AirbyteProtocolDataSource)
