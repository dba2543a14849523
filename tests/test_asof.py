"""As-of / range join operator semantics."""

from __future__ import annotations

from pyairbyte_spark.operators.asof import asof_join, range_join_buckets


def test_asof_join_picks_latest_at_or_before(spark):
    quotes = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 5, 11.0), ("B", 3, 20.0)],
        ["sym", "ts", "price"],
    )
    trades = spark.createDataFrame(
        [("A", 2, 100), ("A", 5, 200), ("A", 9, 300), ("B", 1, 400)],
        ["sym", "ts", "qty"],
    )
    out = {
        (r["sym"], r["ts"]): r["price_asof"]
        for r in asof_join(
            trades, quotes, key_cols=["sym"], ts_col="ts", right_value_cols=["price"]
        ).collect()
    }
    assert out[("A", 2)] == 10.0   # latest quote before ts=2
    assert out[("A", 5)] == 11.0   # tie: quote at exactly trade ts matches
    assert out[("A", 9)] == 11.0   # carried forward
    assert out[("B", 1)] is None   # no prior quote


def test_asof_join_plan_has_single_shuffle(spark):
    quotes = spark.createDataFrame([("A", 1, 10.0)], ["sym", "ts", "price"])
    trades = spark.createDataFrame([("A", 2, 100)], ["sym", "ts", "qty"])
    plan = asof_join(
        trades, quotes, key_cols=["sym"], ts_col="ts", right_value_cols=["price"]
    )._jdf.queryExecution().executedPlan().toString()
    # union + window form: no join node at all, one hash exchange on the key
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_buckets(spark):
    fact = spark.createDataFrame([(1, 5.0), (2, 75.0), (3, 999.0)], ["id", "v"])
    buckets = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 100.0, "mid")], ["lo", "hi", "label"]
    )
    out = {r["id"]: r["label"] for r in range_join_buckets(fact, buckets, value_col="v").collect()}
    assert out == {1: "low", 2: "mid", 3: None}
