"""Dataset surface + guarded SQL tests (reference datasets/_sql.py,
caches/base.py, mcp/local.py behaviors)."""

from __future__ import annotations

import pytest

from pyairbyte_spark.sources import SourceFaker
from pyairbyte_spark.sql_guard import UnsafeSQLError, is_safe_sql


@pytest.fixture()
def loaded(cache):
    SourceFaker(seed=1234, count=30).read(cache, write_strategy="auto")
    return cache


def test_filter_chain_lazy_and_conjunctive(loaded):
    ds = loaded["users"]
    filtered = ds.with_filter("age > 30").with_filter("id <= 20")
    pdf = filtered.to_pandas()
    assert (pdf["age"] > 30).all() and (pdf["id"] <= 20).all()
    # original dataset unchanged (lazy, chainable → new object)
    assert len(ds) == 30


def test_len_memoized_count(loaded):
    ds = loaded["products"]
    assert len(ds) == 100
    assert ds._count == 100


def test_column_names_include_internal(loaded):
    cols = loaded["users"].column_names
    assert {"_airbyte_raw_id", "_airbyte_extracted_at", "_airbyte_meta"} <= set(cols)


def test_iter_yields_dicts(loaded):
    rec = next(iter(loaded["products"]))
    assert isinstance(rec, dict) and "id" in rec


def test_arrow_chunking(loaded):
    tbl = loaded["users"].to_arrow(max_chunk_size=7)
    assert tbl.num_rows == 30
    assert max(len(c.chunks) for c in tbl.columns) >= 4


def test_to_documents(loaded):
    docs = loaded["products"].to_documents(
        title_properties=["make", "model"],
        content_properties=["year", "price"],
        metadata_properties=["id"],
    )
    row = docs.filter("id = '# ' OR true").orderBy("id").take(1)[0]
    assert row.content.startswith("# ")
    assert "## Year" in row.content


def test_metadata_columns_populated(loaded):
    row = loaded["users"].to_spark().select("_airbyte_raw_id", "_airbyte_extracted_at").first()
    assert len(row["_airbyte_raw_id"]) == 36  # uuid-shaped
    assert row["_airbyte_extracted_at"] is not None


def test_raw_id_time_sortable(loaded):
    """UUIDv7-shaped ids sort by extraction time (L4 parity)."""
    ids = [r["_airbyte_raw_id"] for r in loaded["users"].to_spark().collect()]
    assert all(i[14] == "7" for i in ids)  # version nibble


def test_run_sql_query_guarded(loaded):
    out = loaded.run_sql_query("SELECT count(*) AS n FROM users WHERE age > 30")
    assert out[0]["n"] > 0
    with pytest.raises(UnsafeSQLError):
        loaded.run_sql_query("DELETE FROM users")
    with pytest.raises(UnsafeSQLError):
        loaded.run_sql_query("SELECT 1; DROP TABLE users")


@pytest.mark.parametrize(
    ("sql", "ok"),
    [
        ("SELECT 1", True),
        ("  select * from t -- comment", True),
        ("WITH x AS (SELECT 1) SELECT * FROM x", True),
        ("EXPLAIN SELECT 1", True),
        ("SHOW TABLES", True),
        ("DESCRIBE t", True),
        ("INSERT INTO t VALUES (1)", False),
        ("CREATE TABLE t (a int)", False),
        ("WITH x AS (SELECT 1) DELETE FROM t", False),
        ("", False),
    ],
)
def test_is_safe_sql(sql, ok):
    assert is_safe_sql(sql) is ok


def test_max_records_limit(loaded):
    out = loaded.run_sql_query("SELECT * FROM users", max_records=5)
    assert len(out) == 5


def test_pandas_and_arrow_exports(loaded):
    pdf = loaded.get_pandas_dataframe("products")
    assert len(pdf) == 100
    at = loaded.get_arrow_dataset("products", max_chunk_size=30)
    assert at.num_rows == 100
