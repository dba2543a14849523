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
