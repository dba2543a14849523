"""Benchmark source.

Parity with ``get_benchmark_source(num_records="5e5")``
(``airbyte/sources/util.py:142-196``): N records with the
FIVE_STRING_COLUMNS schema. Spark-first: the DataFrame variant is
``spark.range(n)`` + string projections — fully distributed, no
driver-side generation — while the message-iterator variant feeds the
connector-protocol path for pipe-throughput benchmarking.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyairbyte_spark.catalog import StreamSpec
from pyairbyte_spark.sources.base import SparkSource
from pyairbyte_spark.sources.messages import (
    AirbyteMessage,
    RecordMessage,
    TraceMessage,
)
from pyairbyte_spark.state import StateProvider

FIVE_STRING_COLUMNS = ["column1", "column2", "column3", "column4", "column5"]
_SCHEMA = {"properties": {c: {"type": "string"} for c in FIVE_STRING_COLUMNS}}


def benchmark_dataframe(spark: SparkSession, num_records: int) -> DataFrame:
    """Distributed synthetic generator: spark.range → 5 string columns."""
    df = spark.range(num_records)
    return df.select(
        *[
            F.concat(F.lit(f"val-{i}-"), F.col("id").cast("string")).alias(c)
            for i, c in enumerate(FIVE_STRING_COLUMNS)
        ]
    )


class BenchmarkSource(SparkSource):
    name = "source-benchmark"

    def __init__(self, num_records: int | str = "5e5") -> None:
        super().__init__()
        self.num_records = int(float(num_records))

    def discovered_catalog(self) -> dict[str, StreamSpec]:
        return {"purchases": StreamSpec(name="purchases", json_schema=_SCHEMA)}

    def generate_messages(
        self, streams: list[str], state: StateProvider | None
    ) -> Iterator[AirbyteMessage]:
        for stream in streams:
            for i in range(self.num_records):
                yield AirbyteMessage(
                    "RECORD",
                    record=RecordMessage(
                        stream=stream,
                        data={c: f"val-{j}-{i}" for j, c in enumerate(FIVE_STRING_COLUMNS)},
                    ),
                )
            yield AirbyteMessage(
                "TRACE",
                trace=TraceMessage(
                    trace_type="STREAM_STATUS", stream_name=stream, status="COMPLETE"
                ),
            )


def get_benchmark_source(num_records: int | str = "5e5") -> BenchmarkSource:
    return BenchmarkSource(num_records)
