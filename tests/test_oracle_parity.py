"""Mirror of the driver's correctness gate: run every query in
``__spark_entry__.queries()`` on Spark AND its ``oracle_sql()`` on
DuckDB at the same scale factor; compare row-count, column names, and
an order-insensitive multiset of row values.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.conftest import SF_DIR

import __spark_entry__ as entry_mod

QUERY_NAMES = sorted(entry_mod.queries())


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_value(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _row_multiset(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = {}
    for r in rows:
        key = tuple(_norm_value(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    _check_query_vs_oracle(spark, name)


def test_classifier_join_strategy_matches_oracle(spark, monkeypatch):
    """The registered classifier query must stay oracle-green when the
    broadcast-join strategy is forced (the million-bucket path; the
    default 512-bucket model takes the literal-array path)."""
    from functools import partial

    from pyairbyte_spark.operators import text as text_mod

    monkeypatch.setattr(
        text_mod,
        "hashed_linear_score",
        partial(text_mod.hashed_linear_score, literal_max_buckets=16),
    )
    _check_query_vs_oracle(spark, "text_quality_classifier")


def _check_query_vs_oracle(spark, name):
    oracles = entry_mod.oracle_sql()
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    if name not in oracles:
        assert len(spark_rows) >= 0  # rows-only check (driver's weak mode)
        return

    con = _duck_con(SF_DIR)
    res = con.sql(oracles[name])
    duck_cols = list(res.columns)
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    sm = _row_multiset(spark_rows, spark_cols)
    dm = _row_multiset(duck_rows, duck_cols)
    if sm != dm:
        only_spark = {k: v for k, v in sm.items() if dm.get(k) != v}
        only_duck = {k: v for k, v in dm.items() if sm.get(k) != v}
        sample_s = list(only_spark.items())[:3]
        sample_d = list(only_duck.items())[:3]
        raise AssertionError(
            f"{name}: value mismatch; spark-only {sample_s}; duck-only {sample_d}"
        )
