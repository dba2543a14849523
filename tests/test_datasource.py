"""Native PySpark DataSource over the connector protocol (executor-side
subprocess reads)."""

from __future__ import annotations

import sys

import pytest

from tests.test_connector_roundtrip import CONNECTOR_SCRIPT


@pytest.fixture()
def connector_argv(tmp_path):
    script = tmp_path / "fake_connector.py"
    script.write_text(CONNECTOR_SCRIPT)
    return f"{sys.executable} {script}"


def test_read_connector_as_dataframe(spark, connector_argv):
    from pyairbyte_spark.sources.datasource import register

    register(spark)
    df = (
        spark.read.format("airbyte_protocol")
        .option("argv", connector_argv)
        .option("stream", "items")
        .schema("id long, name string")
        .load()
    )
    rows = {r["id"]: r["name"] for r in df.collect()}
    assert rows == {i: f"item-{i}" for i in range(1, 6)}
    # it's a real DataFrame: plans compose (filter + agg on top)
    assert df.filter("id > 3").count() == 2


def test_stream_connector_incremental_offsets(spark, connector_argv, tmp_path):
    """Each micro-batch is one incremental connector read; the Airbyte
    state artifact is the Spark offset, so a caught-up source yields
    empty batches (second read starts from max_id=5 -> 0 new rows)."""
    from pyairbyte_spark.sources.datasource import register

    register(spark)
    stream = (
        spark.readStream.format("airbyte_protocol")
        .option("argv", connector_argv)
        .option("stream", "items")
        .schema("id long, name string")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ds_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {r["id"]: r["name"] for r in spark.table("ds_stream").collect()}
    assert rows == {i: f"item-{i}" for i in range(1, 6)}  # exactly once, no dups
