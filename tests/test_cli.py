"""CLI behavior (reference pyab parity: validate / benchmark / sync / sql)."""

from __future__ import annotations

import json

from pyairbyte_spark.cli import main


def test_validate_fixture(capsys):
    assert main(["validate", "fixture"]) == 0
    out = capsys.readouterr().out
    assert "SUCCEEDED" in out and "stream1" in out


def test_sync_and_sql(tmp_path, capsys, spark):
    wh = str(tmp_path / "wh")
    assert main(["sync", "faker", wh, "--streams", "products"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["record_counts"] == {"products": 100}

    assert main(["sql", wh, "SELECT count(*) AS n FROM products"]) == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["n"] == 100


def test_benchmark_small(capsys, spark):
    assert main(["benchmark", "--source", "benchmark:2000"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["records"] == 2000 and out["records_per_second"] > 0
