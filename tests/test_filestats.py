"""Unit tests for the parquet-footer stats / data-skipping layer."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyairbyte_spark.filestats import (
    MAX_STAT_COLUMNS,
    encode_predicate_value,
    file_may_match,
    harvest_file_stats,
    normalize_predicates,
)


def _write(tmp_path, table: pa.Table, name="f.parquet", **kw) -> str:
    p = str(tmp_path / name)
    pq.write_table(table, p, **kw)
    return p


def test_harvest_scalar_types(tmp_path):
    t = pa.table(
        {
            "i": pa.array([3, 1, None], pa.int64()),
            "f": pa.array([2.5, -1.0, 0.0]),
            "s": pa.array(["b", "a", "c"]),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1), datetime.datetime(2025, 6, 1), None]
            ),
            "d": pa.array([datetime.date(1970, 1, 2), datetime.date(1970, 1, 11)]
                          + [None]),
            "b": pa.array([True, True, None]),
        }
    )
    rec = harvest_file_stats(_write(tmp_path, t))
    assert rec["rows"] == 3
    st = rec["stats"]
    assert st["i"] == {"min": 1, "max": 3, "nulls": 1}
    assert st["f"] == {"min": -1.0, "max": 2.5, "nulls": 0}
    assert st["s"] == {"min": "a", "max": "c", "nulls": 0}
    assert st["ts"]["min"] == encode_predicate_value(datetime.datetime(2024, 1, 1))
    assert st["ts"]["max"] == encode_predicate_value(datetime.datetime(2025, 6, 1))
    # dates encode into the SAME epoch-micros domain as timestamps
    assert st["d"] == {
        "min": 1 * 86_400_000_000,
        "max": 10 * 86_400_000_000,
        "nulls": 1,
    }
    assert rec["sv"] == 2
    assert st["b"] == {"min": True, "max": True, "nulls": 1}


def test_harvest_skips_nested_and_binary(tmp_path):
    t = pa.table(
        {
            "ok": pa.array([1, 2]),
            "bin": pa.array([b"x", b"y"], pa.binary()),
            "arr": pa.array([[1], [2]], pa.list_(pa.int64())),
        }
    )
    rec = harvest_file_stats(_write(tmp_path, t))
    assert set(rec["stats"]) == {"ok"}


def test_harvest_multi_row_group_aggregates(tmp_path):
    t = pa.table({"i": pa.array(list(range(100)))})
    rec = harvest_file_stats(_write(tmp_path, t, row_group_size=10))
    assert rec["rows"] == 100
    assert rec["stats"]["i"] == {"min": 0, "max": 99, "nulls": 0}


def test_harvest_truncated_long_string_gets_bumped_upper_bound(tmp_path):
    long = "z" * 200
    t = pa.table({"s": pa.array(["aaa", long])})
    rec = harvest_file_stats(_write(tmp_path, t))
    st = rec["stats"]["s"]
    assert st["min"] == "aaa"
    # truncated max → prefix with last code point bumped: a VALID
    # upper bound for every string starting with the prefix
    assert st["max"] == "z" * 63 + "{"
    assert st["max"] > long  # bound property
    f = {"rows": 2, "sv": 2, "stats": {"s": st}}
    assert not file_may_match(f, [("s", "<", "a")])
    # upper-bound pruning now works on long-string columns
    assert not file_may_match(f, [("s", ">", "~")])
    assert file_may_match(f, [("s", ">", "zzzz")])  # may match (z*200 does)


def test_harvest_caps_stat_columns(tmp_path):
    t = pa.table({f"c{i:03d}": pa.array([i]) for i in range(40)})
    rec = harvest_file_stats(_write(tmp_path, t))
    assert len(rec["stats"]) == MAX_STAT_COLUMNS


def test_normalize_rejects_unknown_op():
    with pytest.raises(ValueError, match="unsupported predicate op"):
        normalize_predicates([("a", "!=", 1)])
    with pytest.raises(ValueError, match="'in' predicate"):
        normalize_predicates([("a", "in", 5)])


@pytest.mark.parametrize(
    ("op", "value", "expect"),
    [
        ("=", 5, True),
        ("=", 11, False),
        ("=", -1, False),
        ("<", 1, False),
        ("<", 2, True),
        ("<=", 1, True),
        ("<=", 0, False),
        (">", 10, False),
        (">", 9, True),
        (">=", 10, True),
        (">=", 11, False),
        ("in", [0, 11], False),
        ("in", [0, 7], True),
    ],
)
def test_range_pruning(op, value, expect):
    f = {"rows": 5, "stats": {"i": {"min": 1, "max": 10, "nulls": 0}}}
    assert file_may_match(f, normalize_predicates([("i", op, value)])) is expect


def test_null_predicates():
    no_nulls = {"rows": 5, "stats": {"i": {"min": 1, "max": 10, "nulls": 0}}}
    all_nulls = {"rows": 5, "stats": {"i": {"min": 1, "max": 10, "nulls": 5}}}
    unknown = {"rows": 5, "stats": {"i": {"min": 1, "max": 10, "nulls": None}}}
    assert not file_may_match(no_nulls, normalize_predicates([("i", "is_null")]))
    assert file_may_match(all_nulls, normalize_predicates([("i", "is_null")]))
    assert not file_may_match(all_nulls, normalize_predicates([("i", "not_null")]))
    # all-null file: comparisons can never match
    assert not file_may_match(all_nulls, normalize_predicates([("i", "=", 5)]))
    assert file_may_match(unknown, normalize_predicates([("i", "is_null")]))
    assert file_may_match(unknown, normalize_predicates([("i", "not_null")]))


def test_missing_stats_keep_file():
    f = {"rows": 5, "stats": {}}
    assert file_may_match(f, normalize_predicates([("anything", "=", 1)]))
    assert file_may_match({"stats": {"i": {"min": 0, "max": 0, "nulls": 0}}},
                          normalize_predicates([("i", "=", 9)]))  # no rows field


def test_temporal_predicate_encoding():
    ts_lo = encode_predicate_value(datetime.datetime(2024, 1, 1))
    ts_hi = encode_predicate_value(datetime.datetime(2024, 12, 31))
    f = {"rows": 3, "sv": 2,
         "stats": {"ts": {"min": ts_lo, "max": ts_hi, "nulls": 0}}}
    assert not file_may_match(
        f, normalize_predicates([("ts", ">", datetime.datetime(2025, 1, 1))])
    )
    assert file_may_match(
        f, normalize_predicates([("ts", ">=", datetime.datetime(2024, 6, 1))])
    )
    # tz-aware predicate values normalize to UTC-naive micros
    aware = datetime.datetime(2025, 1, 1, tzinfo=datetime.timezone.utc)
    assert not file_may_match(f, normalize_predicates([("ts", ">", aware)]))


def test_cross_type_comparison_keeps_file():
    f = {"rows": 3, "stats": {"s": {"min": "a", "max": "b", "nulls": 0}}}
    assert file_may_match(f, normalize_predicates([("s", ">", 5)]))


def test_date_predicate_on_timestamp_column_does_not_misprune(tmp_path):
    """Regression: a date predicate vs a timestamp column's stats must
    compare in ONE domain. Pre-v2, ts stats were epoch-micros but a
    date predicate encoded to epoch-days, so ``ts < date(2025-01-01)``
    wrongly pruned files whose every row matched."""
    t = pa.table(
        {"ts": pa.array([datetime.datetime(2024, 3, 1),
                         datetime.datetime(2024, 9, 1)])}
    )
    rec = harvest_file_stats(_write(tmp_path, t))
    # every row satisfies ts < 2025-01-01 → the file MUST survive
    assert file_may_match(
        rec, normalize_predicates([("ts", "<", datetime.date(2025, 1, 1))])
    )
    # and the pruning is still effective when genuinely unsatisfiable
    assert not file_may_match(
        rec, normalize_predicates([("ts", "<", datetime.date(2024, 1, 1))])
    )
    assert not file_may_match(
        rec, normalize_predicates([("ts", ">", datetime.date(2025, 1, 1))])
    )
    # timestamp predicate against a DATE column: same single domain
    td = pa.table(
        {"d": pa.array([datetime.date(2024, 3, 1), datetime.date(2024, 9, 1)])}
    )
    rec_d = harvest_file_stats(_write(tmp_path, td, name="d.parquet"))
    assert file_may_match(
        rec_d,
        normalize_predicates([("d", "<", datetime.datetime(2024, 3, 1, 12))]),
    )
    assert not file_may_match(
        rec_d, normalize_predicates([("d", ">", datetime.datetime(2024, 9, 1))])
    )


def test_legacy_v1_stats_keep_file_on_temporal_predicates():
    """v1 manifest entries (no ``sv`` field) have ambiguous temporal
    encodings — any date/datetime predicate must keep the file."""
    # v1-style: date column stats stored as epoch-DAYS
    legacy = {"rows": 2, "stats": {"d": {"min": 19000, "max": 19100, "nulls": 0}}}
    assert file_may_match(
        legacy, normalize_predicates([("d", "<", datetime.date(1970, 1, 2))])
    )
    assert file_may_match(
        legacy,
        normalize_predicates([("d", "in", [datetime.datetime(2030, 1, 1)])]),
    )
    # non-temporal predicates on legacy stats still prune normally
    assert not file_may_match(legacy, normalize_predicates([("d", "<", 100)]))


# -- soundness property: pruning never drops a matching file ---------------

from hypothesis import given, settings, strategies as hst

_vals = hst.one_of(
    hst.integers(-50, 50),
    hst.floats(-50, 50, allow_nan=False, width=32),
    hst.text(alphabet="abcxyz", max_size=4),
    # long strings: exercises the truncated-max bump path (cap is 64)
    hst.text(alphabet="az", min_size=60, max_size=80),
    hst.none(),
)
_rowsets = hst.lists(
    hst.lists(_vals, min_size=1, max_size=8), min_size=1, max_size=4
).filter(
    # one column per file: all non-null values share a type
    lambda rows: len(
        {type(v) for r in rows for v in r if v is not None} | set()
    )
    <= 1
)
_ops = hst.sampled_from(["=", "<", "<=", ">", ">=", "in", "is_null", "not_null"])


@given(rowsets=_rowsets, op=_ops, value=_vals)
@settings(max_examples=150, deadline=None)
def test_pruning_is_sound(tmp_path_factory, rowsets, op, value):
    """For ANY single-column parquet files and ANY predicate: if a row
    satisfies the predicate, its file must survive pruning. (The
    reverse — skipping everything skippable — is an optimization;
    keeping a matching file is CORRECTNESS.)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def sat(v):
        if op == "is_null":
            return v is None
        if op == "not_null":
            return v is not None
        if v is None:
            return False
        try:
            if op == "=":
                return v == value
            if op == "in":
                return v in [value]
            if value is None:
                return False
            if op == "<":
                return v < value
            if op == "<=":
                return v <= value
            if op == ">":
                return v > value
            if op == ">=":
                return v >= value
        except TypeError:
            return False
        return False

    preds = (
        [("c", op)] if op in ("is_null", "not_null") else [("c", op, [value] if op == "in" else value)]
    )
    norm = normalize_predicates(preds)
    tmp = tmp_path_factory.mktemp("sound")
    for i, rows in enumerate(rowsets):
        p = str(tmp / f"f{i}.parquet")
        pq.write_table(pa.table({"c": pa.array(rows)}), p)
        rec = harvest_file_stats(p)
        if any(sat(v) for v in rows):
            assert file_may_match(rec, norm), (
                f"file with matching row pruned: rows={rows} "
                f"pred={preds} stats={rec}"
            )
