"""Skew mitigation: salted joins and hot-key diagnosis.

AQE's skew-join splitting (on by default in `session.py`) handles most
skew at runtime by splitting oversized shuffle partitions. Salting is
the explicit fallback for the cases AQE can't reach — a broadcast-
ineligible medium dimension with one hot key, or aggregations where a
single group overwhelms one task. The salt spreads each hot key over
``salt`` sub-keys: the big side gets a uniform random salt, the small
side replicates every row ``salt`` times, and the join key becomes
(key, salt) — same result set, ``salt``-way parallel hot keys.

Cost model at 100 TB: small side grows ×salt (only acceptable when it
is actually small); big side gets one extra int column and shuffles on
a wider key. Diagnose first (``key_skew_stats``), salt only when the
top key's share justifies ×salt replication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_stats(df: DataFrame, keys: list[str], *, top_n: int = 10) -> DataFrame:
    """Per-key row counts and share of total for the heaviest keys —
    the evidence on which to decide salting. One groupBy shuffle."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = df.count()
    return (
        counts.withColumn("share", F.round(F.col("n_rows") / F.lit(total), 6))
        .orderBy(F.col("n_rows").desc())
        .limit(top_n)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    *,
    salt: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``salt``
    sub-partitions. Result equals ``big.join(small, keys, how)`` for
    inner/left joins (tested); the salt columns never escape.

    ``rand(seed)`` is per-row deterministic given the partitioning, and
    any salt assignment is CORRECT (it only routes rows) — a task retry
    that reassigns salts cannot change the join result.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("salted_join supports inner/left joins")
    salted_big = big.withColumn(
        "__salt", (F.rand(seed) * salt).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_big.join(salted_small, [*keys, "__salt"], how)
    return out.drop("__salt")
