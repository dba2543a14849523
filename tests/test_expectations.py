"""Write-time CHECK expectations: fail / drop / quarantine modes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.cache import SparkCache
from pyairbyte_spark.exceptions import PyAirbyteInputError
from pyairbyte_spark.expectations import (
    ExpectationViolation,
    check_expectations,
    violation_counts,
)
from pyairbyte_spark.strategies import WriteMethod


@pytest.fixture()
def cache(spark, tmp_path):
    return SparkCache(spark, warehouse_dir=str(tmp_path / "wh"))


def _df(spark):
    rows = [
        (1, 10.0, "us"),
        (2, -5.0, "de"),  # violates positive_amount
        (3, 7.0, None),  # violates country_not_null
        (None, 3.0, "fr"),  # violates id_not_null
    ]
    df = spark.createDataFrame(rows, ["id", "amount", "country"])
    return df.withColumn("_airbyte_raw_id", F.expr("uuid()")).withColumn(
        "_airbyte_extracted_at", F.current_timestamp()
    )


CHECKS = {
    "positive_amount": "amount > 0",
    "country_not_null": "country IS NOT NULL",
    "id_not_null": "id IS NOT NULL",
}


def test_violation_counts_single_pass(spark):
    counts = violation_counts(_df(spark), CHECKS)
    assert counts == {
        "positive_amount": 1,
        "country_not_null": 1,
        "id_not_null": 1,
    }


def test_null_check_result_passes_sql_semantics(spark):
    """CHECK semantics: NULL expression result is NOT a violation."""
    df = spark.createDataFrame([(None,), (2,)], ["x"])
    # "x > 0" is NULL for the null row → passes; only FALSE violates
    assert violation_counts(df, {"pos": "x > 0"}) == {"pos": 0}
    assert violation_counts(df, {"pos": "x IS NOT NULL"}) == {"pos": 1}


def test_fail_mode_raises_and_writes_nothing(spark, cache):
    with pytest.raises(ExpectationViolation) as ei:
        cache.write_dataframe(
            _df(spark), "t", WriteMethod.APPEND, expectations=CHECKS
        )
    assert ei.value.counts == {
        "positive_amount": 1,
        "country_not_null": 1,
        "id_not_null": 1,
    }
    assert "t" not in cache


def test_fail_mode_clean_data_writes(spark, cache):
    clean = _df(spark).filter(
        (F.col("amount") > 0) & F.col("country").isNotNull() & F.col("id").isNotNull()
    )
    counts = cache.write_dataframe(
        clean, "t", WriteMethod.APPEND, expectations=CHECKS
    )
    assert counts == {"positive_amount": 0, "country_not_null": 0, "id_not_null": 0}
    assert len(cache["t"]) == 1


def test_drop_mode_filters_and_counts_via_observe(spark, cache):
    counts = cache.write_dataframe(
        _df(spark),
        "t",
        WriteMethod.APPEND,
        expectations=CHECKS,
        on_violation="drop",
    )
    assert counts == {
        "positive_amount": 1,
        "country_not_null": 1,
        "id_not_null": 1,
    }
    got = cache.store.read(cache.table_name("t"))
    assert [r["id"] for r in got.select("id").collect()] == [1]


def test_quarantine_mode_lands_rejects_with_reasons(spark, cache):
    counts = cache.write_dataframe(
        _df(spark),
        "t",
        WriteMethod.APPEND,
        expectations=CHECKS,
        on_violation="quarantine",
    )
    assert sum(counts.values()) == 3
    assert len(cache["t"]) == 1
    q = cache.store.read(cache.table_name("t_quarantine"))
    reasons = {
        r["id"]: sorted(r["_failed_expectations"])
        for r in q.select("id", "_failed_expectations").collect()
    }
    assert reasons[2] == ["positive_amount"]
    assert reasons[3] == ["country_not_null"]
    assert reasons[None] == ["id_not_null"]


def test_multi_violation_row_lists_all_reasons(spark, cache):
    df = spark.createDataFrame(
        [(None, -1.0, None)], "id bigint, amount double, country string"
    )
    df = df.withColumn("_airbyte_raw_id", F.expr("uuid()")).withColumn(
        "_airbyte_extracted_at", F.current_timestamp()
    )
    cache.write_dataframe(
        df, "t", WriteMethod.APPEND, expectations=CHECKS, on_violation="quarantine"
    )
    q = cache.store.read(cache.table_name("t_quarantine"))
    (row,) = q.select("_failed_expectations").collect()
    assert sorted(row[0]) == ["country_not_null", "id_not_null", "positive_amount"]


def test_column_expression_checks(spark):
    df = spark.createDataFrame([(1,), (200,)], ["x"])
    clean, _, _ = check_expectations(
        df, {"small": F.col("x") < 100}, on_violation="drop"
    )
    assert [r["x"] for r in clean.collect()] == [1]


def test_unknown_mode_raises(spark):
    with pytest.raises(PyAirbyteInputError):
        check_expectations(
            spark.range(1), {"c": "id > 0"}, on_violation="explode"
        )


# -- persisted CHECK constraints (table-level, enforced in every write) ------


from pyairbyte_spark.writers import CommitLogTableStore


@pytest.fixture()
def acid(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path / "wh"), "main")


def _adf(spark, rows, raw_prefix="r"):
    df = spark.createDataFrame(rows, ["id", "v"])
    return df.withColumn(
        "_airbyte_raw_id", F.concat(F.lit(raw_prefix), F.col("id").cast("string"))
    ).withColumn("_airbyte_extracted_at", F.current_timestamp())


def test_set_check_validates_existing_rows(spark, acid):
    acid.write_append(_adf(spark, [(1, "a"), (-5, "b")]).coalesce(1), "t")
    with pytest.raises(ExpectationViolation):
        acid.set_check("t", "id_positive", "id > 0")
    assert acid.table_checks("t") == {}
    acid.delete_where("t", [("id", "<", 0)])
    v = acid.set_check("t", "id_positive", "id > 0")
    assert acid.table_checks("t") == {"id_positive": "id > 0"}
    assert acid.latest_version("t") == v


def test_checked_table_rejects_violating_writes_atomically(spark, acid):
    acid.write_append(_adf(spark, [(1, "a")]).coalesce(1), "t")
    acid.set_check("t", "id_positive", "id > 0")
    before = acid.latest_version("t")
    for op in ("append", "replace", "merge"):
        bad = _adf(spark, [(2, "ok"), (-1, "bad")], op).coalesce(1)
        with pytest.raises(ExpectationViolation) as ei:
            if op == "append":
                acid.write_append(bad, "t")
            elif op == "replace":
                acid.write_replace(bad, "t")
            else:
                acid.write_merge(bad, "t", ["id"])
        assert "id_positive" in ei.value.counts
        # nothing published: version and data untouched
        assert acid.latest_version("t") == before
        assert acid.read("t").count() == 1
    # valid writes still flow
    acid.write_append(_adf(spark, [(7, "x")], "z").coalesce(1), "t")
    assert acid.read("t").count() == 2


def test_update_where_cannot_violate_table_check(spark, acid):
    """The round-4 gap: an UPDATE could publish rows violating a
    table CHECK. Now the rewrite itself fails and publishes nothing."""
    acid.write_append(_adf(spark, [(i, "a") for i in range(1, 6)]).coalesce(1), "t")
    acid.set_check("t", "id_positive", "id > 0")
    before = acid.latest_version("t")
    with pytest.raises(ExpectationViolation) as ei:
        acid.update_where("t", [("id", "=", 3)], {"id": "-99"})
    assert "id_positive" in ei.value.counts
    assert acid.latest_version("t") == before
    assert sorted(r["id"] for r in acid.read("t").collect()) == [1, 2, 3, 4, 5]
    # a non-violating update on the same table succeeds
    res = acid.update_where("t", [("id", "=", 3)], {"v": F.lit("ok")})
    assert res["updated_rows"] == 1


def test_checks_survive_compact_replace_and_delta_chains(spark, acid):
    acid.write_append(_adf(spark, [(1, "a")]).coalesce(1), "t")
    acid.set_check("t", "id_positive", "id > 0")
    acid.write_append(_adf(spark, [(2, "b")], "s").coalesce(1), "t")
    acid.compact("t")
    acid.write_replace(_adf(spark, [(9, "r")], "q").coalesce(1), "t")
    assert acid.table_checks("t") == {"id_positive": "id > 0"}
    with pytest.raises(ExpectationViolation):
        acid.write_append(_adf(spark, [(-1, "bad")], "x").coalesce(1), "t")


def test_drop_check_and_column_guards(spark, acid):
    acid.write_append(_adf(spark, [(1, "a")]).coalesce(1), "t")
    acid.set_check("t", "id_positive", "id > 0")
    with pytest.raises(ValueError, match="referenced by check"):
        acid.rename_column("t", "id", "ident")
    with pytest.raises(ValueError, match="referenced by check"):
        acid.drop_column("t", "id")
    acid.drop_check("t", "id_positive")
    assert acid.table_checks("t") == {}
    acid.write_append(_adf(spark, [(-1, "fine-now")], "x").coalesce(1), "t")
    assert acid.read("t").count() == 2
    with pytest.raises(ValueError, match="no check named"):
        acid.drop_check("t", "nope")


def test_quarantine_rides_txn_group(spark, tmp_path):
    """Regression (ADVICE r10): under an atomic sync, quarantined rows
    landed OUTSIDE the txn group — visible even when the group later
    aborted, a hole in the zero-partial-state guarantee. Both the
    clean and quarantine writes must ride the same group."""
    import uuid

    cache = SparkCache(
        spark, warehouse_dir=str(tmp_path / "wh"), table_format="commitlog"
    )
    store = cache.store
    store.TXN_RESOLVE_GRACE_S = 0.2
    gid = uuid.uuid4().hex
    cache.write_dataframe(
        _df(spark),
        "t",
        WriteMethod.APPEND,
        expectations=CHECKS,
        on_violation="quarantine",
        txn_group=gid,
    )
    qt = cache.table_name("t_quarantine")
    # undecided: NEITHER table shows rows
    assert not store.table_exists(cache.table_name("t")) or (
        store.read(cache.table_name("t")).count() == 0
    )
    assert not store.table_exists(qt) or store.read(qt).count() == 0
    store._decide_group(gid, "abort")
    assert not store.table_exists(qt) or store.read(qt).count() == 0
    # a committed group lands both sides atomically
    gid2 = uuid.uuid4().hex
    cache.write_dataframe(
        _df(spark),
        "t",
        WriteMethod.APPEND,
        expectations=CHECKS,
        on_violation="quarantine",
        txn_group=gid2,
    )
    store._decide_group(gid2, "commit")
    assert store.read(cache.table_name("t")).count() == 1
    assert store.read(qt).count() == 3
