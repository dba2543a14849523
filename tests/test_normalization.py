"""Name-normalization behavior (mirrors reference
tests/unit_tests/test_text_normalization.py:21-228)."""

from __future__ import annotations

import pytest

from pyairbyte_spark.names import (
    LowerCaseNormalizer,
    NameNormalizationError,
    normalize_records_keys,
)


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("Column1", "column1"),
        ("table1.Column1", "table1_column1"),
        ("UPPER CASE", "upper_case"),
        ("with-dash", "with_dash"),
        ("special!@#chars", "special___chars"),
        ("1starts_with_digit", "_1starts_with_digit"),
        ("already_fine", "already_fine"),
        ("ümlaut", "_mlaut"),
    ],
)
def test_lowercase_normalizer(raw, expected):
    assert LowerCaseNormalizer.normalize(raw) == expected


@pytest.mark.parametrize("bad", ["", "!!!", "___", "-"])
def test_invalid_names_raise(bad):
    with pytest.raises(NameNormalizationError):
        LowerCaseNormalizer.normalize(bad)


def test_record_key_normalization_prunes_and_keeps_nested():
    rec = {"Outer.Key": {"Inner.Key": 1}, "keep": 2, "Drop": 3}
    out = normalize_records_keys(rec, keys=["Outer.Key", "keep"])
    assert out == {"outer_key": {"Inner.Key": 1}, "keep": 2}


def test_display_case_round_trip(spark, tmp_path):
    """Columns land normalized but can be renamed back to declared
    casing (reference to_display_case, records.py:149-154)."""
    from pyairbyte_spark import SparkCache
    from pyairbyte_spark.catalog import StreamSpec
    from pyairbyte_spark.processor import MessageStreamProcessor
    from pyairbyte_spark.sources.messages import AirbyteMessage, RecordMessage
    from pyairbyte_spark.strategies import WriteStrategy

    cache = SparkCache(spark, str(tmp_path))
    spec = StreamSpec(
        name="CamelStream",
        json_schema={
            "properties": {"UserId": {"type": "integer"}, "FullName": {"type": "string"}}
        },
    )
    msgs = [
        AirbyteMessage(
            "RECORD",
            record=RecordMessage("CamelStream", {"UserId": 1, "FullName": "Ada"}),
        )
    ]
    MessageStreamProcessor(
        cache, source_name="t", specs={"CamelStream": spec},
        write_strategy=WriteStrategy.APPEND,
    ).process_messages(iter(msgs))

    ds = cache["camelstream"]
    assert {"userid", "fullname"} <= set(ds.column_names)  # normalized at rest
    pretty = ds.with_display_names()
    assert {"UserId", "FullName"} <= set(pretty.column_names)  # round-trip
    assert pretty.to_spark().select("UserId").collect()[0][0] == 1
