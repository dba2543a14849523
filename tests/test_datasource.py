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
