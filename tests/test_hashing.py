"""One-way config hashing (F5) and stdin message source (S13)."""

from __future__ import annotations

import io

from pyairbyte_spark.hashing import one_way_hash, sha256_expr
from pyairbyte_spark.sources.messages import AirbyteMessageIterator, encode_record


def test_one_way_hash_stable_and_order_insensitive():
    a = {"host": "x", "port": 5432, "nested": {"b": 2, "a": 1}}
    b = {"nested": {"a": 1, "b": 2}, "port": 5432, "host": "x"}
    assert one_way_hash(a) == one_way_hash(b)
    assert len(one_way_hash(a)) == 64
    assert one_way_hash(a) != one_way_hash({**a, "port": 5433})


def test_one_way_hash_handles_non_json_values():
    class Thing:
        def __str__(self):
            return "thing"

    assert one_way_hash({"obj": Thing()}) == one_way_hash({"obj": "thing"})


def test_sha256_expr_row_hash(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "id int, s string")
    out = df.select(sha256_expr("id", "s").alias("h")).collect()
    assert out[0]["h"] == out[1]["h"] != out[2]["h"]
    assert len(out[0]["h"]) == 64


def test_from_stdin_reads_protocol_lines(monkeypatch):
    import sys

    lines = encode_record("s1", {"id": 1}) + "\n" + encode_record("s1", {"id": 2}) + "\n"
    monkeypatch.setattr(sys, "stdin", io.StringIO(lines))
    msgs = list(AirbyteMessageIterator.from_stdin())
    assert [m.record.data["id"] for m in msgs if m.type == "RECORD"] == [1, 2]
