"""Incrementally maintained aggregates from the change data feed.

The materialized-view maintenance primitive a 100 TB deployment uses
instead of nightly full recomputes: per-group COUNT/SUM state is
updated from a CDF window by SIGN arithmetic — each change row
contributes ``+1`` (insert / update_postimage) or ``-1`` (delete /
update_preimage) times its values, so the delta aggregation touches
only the CHANGED rows, and folding it into the materialized state is
one union + re-aggregate on the group keys (cost O(changed groups +
materialized groups), independent of the base table size).

Works over :meth:`CommitLogTableStore.read_changes` with
``include_preimages=True`` (update pre-images carry the values to
subtract — Delta CDF parity added alongside this module). Decomposable
aggregates only (count, sum, and anything derivable: avg = sum/n);
min/max are not incrementally maintainable under deletes without
re-reading the group, by construction.

Exactness: pass DECIMAL value columns for arithmetic that is
associative under subtraction (float cancellation would drift over
long maintenance histories); the oracle query
(``store_incremental_agg_events``) pins decimal-exact parity between
an incrementally maintained aggregate and a from-scratch SQL
recompute over the equivalent final state.

Reference parity note: no analogue — the reference re-reads the cache
for every query (`airbyte/datasets/_sql.py`); incremental maintenance
is net-new capability for warehouse-scale consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ADDS = ("insert", "update_postimage")
_SUBS = ("delete", "update_preimage")


def _sign() -> "F.Column":
    return (
        F.when(F.col("_change_type").isin(*_ADDS), F.lit(1))
        .when(F.col("_change_type").isin(*_SUBS), F.lit(-1))
        .otherwise(
            # 'upsert' (pre-primary-key digest diffs) has no pairing —
            # it cannot be consumed by sign arithmetic; fail loudly
            # inside the job rather than silently corrupting state.
            F.raise_error(
                F.concat(
                    F.lit("incremental aggregates cannot consume "
                          "_change_type="),
                    F.col("_change_type"),
                    F.lit(" (need insert/delete/update_pre+postimage; "
                          "read the feed with include_preimages=True "
                          "on a primary-keyed table)"),
                )
            ).cast("int")
        )
    )


def materialize_sums(
    df: DataFrame, keys: list[str], value_cols: list[str]
) -> DataFrame:
    """The initial materialization: per-group count + sums of a
    snapshot. Columns: keys, ``n``, ``sum_<col>``…"""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(c).alias(f"sum_{c}") for c in value_cols],
    )


def delta_sums(
    feed: DataFrame, keys: list[str], value_cols: list[str]
) -> DataFrame:
    """Per-group signed deltas of a CDF window — same schema as
    :func:`materialize_sums`, so it folds with one union. Aggregates
    only the CHANGE rows: the base table is never rescanned."""
    s = _sign()
    return feed.groupBy(*keys).agg(
        F.sum(s).cast("long").alias("n"),
        *[F.sum(s * F.col(c)).alias(f"sum_{c}") for c in value_cols],
    )


def apply_deltas(
    current: DataFrame, delta: DataFrame, keys: list[str]
) -> DataFrame:
    """Fold a delta frame into the materialized state: union +
    re-aggregate on the keys (ONE shuffle over O(groups) rows),
    dropping groups whose live count reaches zero. Null-sum handling:
    a group whose delta is all-NULL values still adjusts ``n``."""
    sum_cols = [c for c in current.columns if c not in keys and c != "n"]
    merged = current.unionByName(delta, allowMissingColumns=True)
    out = merged.groupBy(*keys).agg(
        F.sum("n").cast("long").alias("n"),
        *[F.sum(c).alias(c) for c in sum_cols],
    )
    return out.filter(F.col("n") > 0)


def refresh_sums(
    store,
    table_name: str,
    current: DataFrame,
    from_version: int,
    keys: list[str],
    value_cols: list[str],
    *,
    to_version: int | None = None,
) -> tuple[DataFrame, int]:
    """Convenience: advance a materialized sum/count aggregate of
    ``table_name`` from snapshot ``from_version`` to ``to_version``
    (default latest) by consuming the change feed once. Returns
    ``(new_state, new_version)`` — the caller owns persisting both
    (state into any table, the watermark wherever its pipeline keeps
    offsets; the streaming follower's checkpoint pattern applies)."""
    to = (
        store.latest_version(table_name)
        if to_version is None
        else to_version
    )
    if to <= from_version:
        return current, from_version
    feed = store.read_changes(
        table_name, from_version, to, include_preimages=True
    )
    return (
        apply_deltas(current, delta_sums(feed, keys, value_cols), keys),
        to,
    )


# -- min/max maintenance (the standard fallback) -----------------------------
# min/max are NOT sign-decomposable: deleting a non-extremum row is
# free, but deleting the current extremum invalidates the group's
# value — the group must be re-read. The standard technique (what
# Materialize/Flink do for MIN/MAX under retractions without full
# per-group heaps):
#   - inserts fold in for free (least/greatest with the candidates);
#   - a CDF window's delete/update_preimage rows are checked against
#     the group's candidate extremum: only groups where a subtracted
#     value TIES OR BEATS it are "dirty";
#   - dirty groups (usually a tiny fraction) re-aggregate from the
#     CURRENT snapshot, filtered by a key semi-join — O(dirty groups)
#     result rows, and when the base table is clustered on the group
#     key, zone maps prune the rescan to the dirty slice.


def materialize_aggs(
    df: DataFrame,
    keys: list[str],
    value_cols: list[str],
    minmax_cols: list[str] | None = None,
) -> DataFrame:
    """Initial materialization with optional min/max columns:
    keys, ``n``, ``sum_<col>``…, ``min_<col>``/``max_<col>``…"""
    mm = minmax_cols or []
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(c).alias(f"sum_{c}") for c in value_cols],
        *[F.min(c).alias(f"min_{c}") for c in mm],
        *[F.max(c).alias(f"max_{c}") for c in mm],
    )


def refresh_aggs(
    store,
    table_name: str,
    current: DataFrame,
    from_version: int,
    keys: list[str],
    value_cols: list[str],
    minmax_cols: list[str] | None = None,
    *,
    to_version: int | None = None,
) -> tuple[DataFrame, int]:
    """:func:`refresh_sums` extended with min/max maintenance. Counts
    and sums advance by sign arithmetic exactly as before; min/max
    fold inserts in directly and re-aggregate ONLY the groups whose
    current extremum was (possibly) deleted. Returns
    ``(new_state, new_version)``."""
    mm = minmax_cols or []
    to = (
        store.latest_version(table_name)
        if to_version is None
        else to_version
    )
    if to <= from_version:
        return current, from_version
    feed = store.read_changes(
        table_name, from_version, to, include_preimages=True
    )
    sum_cols = ["n"] + [f"sum_{c}" for c in value_cols]
    if not mm:
        return (
            apply_deltas(
                current.select(*keys, *sum_cols),
                delta_sums(feed, keys, value_cols),
                keys,
            ),
            to,
        )
    # ONE aggregation of the feed computes the signed count/sum deltas
    # AND the per-group add/sub extrema (was three: delta_sums + adds +
    # subs, each re-shuffling the same keys — guide §2.3, aggregate
    # once). The group-sized result is lazily checkpointed so the sums
    # and min/max branches below share one materialization of the
    # per-commit CDF plans instead of re-executing them per consumer;
    # `current` (the caller's materialized state) gets the same
    # treatment — it feeds both branches too.
    s = _sign()
    ct = F.col("_change_type")
    current = current.localCheckpoint(eager=False)
    chg = (
        feed.groupBy(*keys)
        .agg(
            F.sum(s).cast("long").alias("n"),
            *[F.sum(s * F.col(c)).alias(f"sum_{c}") for c in value_cols],
            *[
                F.min(F.when(ct.isin(*_ADDS), F.col(c))).alias(
                    f"__add_min_{c}"
                )
                for c in mm
            ],
            *[
                F.max(F.when(ct.isin(*_ADDS), F.col(c))).alias(
                    f"__add_max_{c}"
                )
                for c in mm
            ],
            *[
                F.min(F.when(ct.isin(*_SUBS), F.col(c))).alias(
                    f"__sub_min_{c}"
                )
                for c in mm
            ],
            *[
                F.max(F.when(ct.isin(*_SUBS), F.col(c))).alias(
                    f"__sub_max_{c}"
                )
                for c in mm
            ],
        )
        .localCheckpoint(eager=False)
    )
    sums_state = apply_deltas(
        current.select(*keys, *sum_cols),
        chg.select(*keys, *sum_cols),
        keys,
    )
    # Candidate extrema (state folded with the window's inserts) and
    # the dirty flag in ONE full-outer join of two group-sized frames
    # (was two joins: current ⋈ adds, then ⋈ subs). Semantics
    # unchanged: a key with only sub rows and no state row yields NULL
    # candidate extrema, a NULL dirty condition, and coalesces to
    # clean — and such a key cannot survive the n > 0 filter on the
    # sums side, so the final left join never sees it either way.
    dirty_cond = None
    for c in mm:
        hit = (F.col(f"__sub_min_{c}") <= F.col(f"min_{c}")) | (
            F.col(f"__sub_max_{c}") >= F.col(f"max_{c}")
        )
        dirty_cond = hit if dirty_cond is None else (dirty_cond | hit)
    flagged = (
        current.select(
            *keys, *[f"min_{c}" for c in mm], *[f"max_{c}" for c in mm]
        )
        .join(chg, on=keys, how="full_outer")
        .select(
            *keys,
            *[
                F.least(F.col(f"min_{c}"), F.col(f"__add_min_{c}")).alias(
                    f"min_{c}"
                )
                for c in mm
            ],
            *[
                F.greatest(
                    F.col(f"max_{c}"), F.col(f"__add_max_{c}")
                ).alias(f"max_{c}")
                for c in mm
            ],
            *[F.col(f"__sub_min_{c}") for c in mm],
            *[F.col(f"__sub_max_{c}") for c in mm],
        )
        .withColumn("__dirty", F.coalesce(dirty_cond, F.lit(False)))
    )
    clean = flagged.filter(~F.col("__dirty")).select(
        *keys, *[f"min_{c}" for c in mm], *[f"max_{c}" for c in mm]
    )
    dirty_keys = flagged.filter(F.col("__dirty")).select(*keys)
    recomputed = (
        store.read_version(table_name, to)
        .join(F.broadcast(dirty_keys), on=keys, how="left_semi")
        .groupBy(*keys)
        .agg(
            *[F.min(c).alias(f"min_{c}") for c in mm],
            *[F.max(c).alias(f"max_{c}") for c in mm],
        )
    )
    mm_state = clean.unionByName(recomputed)
    return (
        sums_state.join(mm_state, on=keys, how="left"),
        to,
    )
