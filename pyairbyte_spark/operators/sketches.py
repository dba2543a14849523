"""Mergeable sketches for cardinality and frequency at 100 TB scale.

**HyperLogLog** (`hll_distinct`): approximate COUNT(DISTINCT) with a
fixed 2^p-register sketch per group. The implementation is engineered
for *bit-exact cross-engine reproducibility* so a DuckDB oracle can
verify it value-for-value:

- hash: first 15 hex chars of md5 (60 bits) as a non-negative BIGINT —
  identical in Spark (``conv(substring(md5(x),1,15),16,10)``) and
  DuckDB (``('0x' || substr(md5(x),1,15))::BIGINT``);
- register index = low p bits, remainder ``w`` = high ``W = 60 - p``
  bits; rank ``rho = W + 1 - bit_length(w)`` computed with
  ``length(bin(w))`` — pure integer/string ops, no floating log2 (a
  1-ulp ``log2`` difference at a power-of-two boundary would flip the
  register value between engines);
- register sum kept as an *exact integer*: each register M contributes
  ``2^(W+1-M)``, empty registers ``2^(W+1)`` — sums fit in int64 for
  p <= 10;
- the raw estimate is ONE double division of a Python-folded literal
  constant ``alpha_m * m^2 * 2^(W+1)`` by that integer — a single IEEE
  op, identical everywhere; the linear-counting branch for small
  cardinalities uses the standard ``m * ln(m/V)`` and rounds to int.

Scale posture: one shuffle on (group, register) with map-side partial
``max`` — registers are the merge, so daily sketches roll up to monthly
ones with the same ``max``; 2^p * 8 bytes of state per group
regardless of input size. The exact count (when requested) rides the
SAME shuffle: each distinct value hashes to exactly one register, so
``sum(count(distinct value))`` over registers is the exact global
distinct — the standard two-level distinct that avoids a single hot
reducer per group at 100 TB.

Reference analog: the reference exposes no approximate aggregates at
all (``airbyte/datasets/_sql.py`` count is exact ``SELECT count(*)``);
this is part of the large-scale analytics surface the engine adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_HEX_CHARS = 15  # 60 bits: fits BIGINT in both engines


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_params(p: int) -> dict:
    """Shared constants for the Spark and SQL formulations."""
    # The exact integer register sum is size-free in p: occupied
    # registers contribute 2^(W+1-M) and empty ones 2^(W+1) with
    # W = 60-p, so the per-group total is always exactly <= m*2^(61-p)
    # = 2^61 — inside int64 for ANY p. The cap is the 60-bit hash:
    # p=16 leaves a 44-bit rank domain (plenty) and m=65536 registers
    # (±0.4% error) for high-cardinality profiling; the register frame
    # itself is SPARSE (occupied-only rows), so a large m costs
    # nothing at low fill (gated in tests/test_plans.py).
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16] (60-bit hash domain)")
    m = 1 << p
    w_bits = 60 - p
    scale = 1 << (w_bits + 1)
    # alpha_m * m^2 * 2^(W+1): folded HERE so both engines divide the
    # same double literal by the same integer — one IEEE op each.
    raw_num = _alpha(m) * m * m * float(scale)
    return {
        "m": m,
        "w_bits": w_bits,
        "scale": scale,
        "raw_num": raw_num,
        "lc_threshold": 2.5 * m,
    }


def hll_hash(value: Column) -> Column:
    """60-bit md5-prefix hash, non-negative BIGINT (engine-portable)."""
    return F.conv(
        F.substring(F.md5(value.cast("string")), 1, _HASH_HEX_CHARS), 16, 10
    ).cast("long")


def _bucket_rho(value: Column, p: int) -> tuple[Column, Column]:
    """(register index, rank) columns for one value expression."""
    w_bits = 60 - p
    h = hll_hash(value)
    bucket = (h % F.lit(1 << p)).alias("__hll_bucket")
    w = F.shiftright(h, p)
    rho = (
        F.when(w == 0, F.lit(w_bits + 1))
        .otherwise(F.lit(w_bits + 1) - F.length(F.bin(w)))
        .alias("__hll_rho")
    )
    return bucket, rho


def hll_registers(
    df: DataFrame,
    *,
    group_cols: list[str],
    value: Column | str,
    p: int = 8,
) -> DataFrame:
    """The sketch itself: per-(group, register) max rank — the
    persistable / mergeable state (2^p rows per group, any input size).
    """
    hll_params(p)
    val = F.col(value) if isinstance(value, str) else value
    bucket, rho = _bucket_rho(val, p)
    return (
        df.select(*group_cols, bucket, rho)
        .groupBy(*group_cols, "__hll_bucket")
        .agg(F.max("__hll_rho").alias("__hll_m"))
    )


def merge_hll_registers(
    current: DataFrame, delta: DataFrame, *, group_cols: list[str]
) -> DataFrame:
    """Fold delta registers into the materialized state: union + max on
    (group, register) — ONE shuffle over O(groups * 2^p) rows. Register
    max is commutative/idempotent, so replayed deltas are harmless."""
    return (
        current.unionByName(delta)
        .groupBy(*group_cols, "__hll_bucket")
        .agg(F.max("__hll_m").alias("__hll_m"))
    )


def hll_delta_registers(
    feed: DataFrame,
    *,
    group_cols: list[str],
    value: Column | str,
    p: int = 8,
) -> DataFrame:
    """Registers of a CDF window, for incremental maintenance.

    HLL registers are max-monotone: INSERTS fold in exactly, but a
    register can never be lowered, so deletes / update pre-images are
    NOT maintainable (same class as min/max in
    ``operators/incremental.py``). Any non-insert change row raises
    inside the job rather than silently over-counting forever.
    """
    val = F.col(value) if isinstance(value, str) else value
    guard = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "hll registers are insert-monotone; cannot consume "
                    "_change_type="
                ),
                F.col("_change_type"),
            )
        ).cast("int")
    )
    # Multiply the rank by the (always-1) guard so column pruning can't
    # optimize the check away.
    bucket, rho = _bucket_rho(val, p)
    guarded_rho = ((F.col("__hll_rho0") * guard).alias("__hll_rho"))
    return (
        feed.select(*group_cols, bucket, rho.alias("__hll_rho0"), "_change_type")
        .select(*group_cols, "__hll_bucket", guarded_rho)
        .groupBy(*group_cols, "__hll_bucket")
        .agg(F.max("__hll_rho").alias("__hll_m"))
    )


def hll_estimate(
    registers: DataFrame, *, group_cols: list[str], p: int = 8
) -> DataFrame:
    """Estimate from materialized registers (same math as
    :func:`hll_distinct`, so an incrementally maintained sketch equals
    the from-scratch one bit-for-bit)."""
    prm = hll_params(p)
    m, w_bits, scale = prm["m"], prm["w_bits"], prm["scale"]
    occ_term = F.pow(F.lit(2.0), F.lit(w_bits + 1) - F.col("__hll_m")).cast(
        "long"
    )
    grouped = registers.groupBy(*group_cols).agg(
        F.sum(occ_term).alias("__occ_sum"),
        F.count(F.lit(1)).alias("__occupied"),
    )
    v_empty = F.lit(m) - F.col("__occupied")
    reg_sum = F.col("__occ_sum") + v_empty * F.lit(scale)
    raw = F.lit(prm["raw_num"]) / reg_sum.cast("double")
    approx = (
        F.when(
            (raw <= F.lit(prm["lc_threshold"])) & (v_empty > 0),
            F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / v_empty)),
        )
        .otherwise(F.round(raw))
        .cast("long")
        .alias("approx_distinct")
    )
    return grouped.select(*group_cols, approx)


def refresh_hll(
    store,
    table_name: str,
    current: DataFrame,
    from_version: int,
    *,
    group_cols: list[str],
    value: Column | str,
    p: int = 8,
    to_version: int | None = None,
) -> tuple[DataFrame, int]:
    """Advance materialized HLL registers of ``table_name`` from
    snapshot ``from_version`` by consuming the change feed once
    (insert-only windows; see :func:`hll_delta_registers`). Mirrors
    ``operators.incremental.refresh_sums``; the caller owns persisting
    the state and the version watermark."""
    to = (
        store.latest_version(table_name)
        if to_version is None
        else to_version
    )
    if to <= from_version:
        return current, from_version
    feed = store.read_changes(table_name, from_version, to)
    delta = hll_delta_registers(
        feed, group_cols=group_cols, value=value, p=p
    )
    return merge_hll_registers(current, delta, group_cols=group_cols), to


def hll_distinct(
    df: DataFrame,
    *,
    group_cols: list[str],
    value: Column | str,
    p: int = 8,
    include_exact: bool = False,
) -> DataFrame:
    """Per-group approximate distinct count of ``value``.

    Output: group_cols + ``approx_distinct`` (+ ``n_exact`` when
    ``include_exact``). Deterministic: same input -> same estimate,
    regardless of partitioning (register max is commutative).
    """
    prm = hll_params(p)
    m, w_bits, scale = prm["m"], prm["w_bits"], prm["scale"]
    val = F.col(value) if isinstance(value, str) else value
    bucket, rho = _bucket_rho(val, p)
    exact_aggs = (
        [F.count_distinct(F.col("__hll_val")).alias("__hll_nd")]
        if include_exact
        else []
    )
    regs = (
        df.select(*group_cols, bucket, rho, *(
            [val.alias("__hll_val")] if include_exact else []
        ))
        .groupBy(*group_cols, "__hll_bucket")
        .agg(F.max("__hll_rho").alias("__hll_m"), *exact_aggs)
    )
    # Exact integer register sum: occupied 2^(W+1-M), empty 2^(W+1).
    occ_term = F.pow(F.lit(2.0), F.lit(w_bits + 1) - F.col("__hll_m")).cast(
        "long"
    )
    grouped = regs.groupBy(*group_cols).agg(
        F.sum(occ_term).alias("__occ_sum"),
        F.count(F.lit(1)).alias("__occupied"),
        *([F.sum("__hll_nd").alias("n_exact")] if include_exact else []),
    )
    v_empty = F.lit(m) - F.col("__occupied")
    reg_sum = F.col("__occ_sum") + v_empty * F.lit(scale)
    raw = F.lit(prm["raw_num"]) / reg_sum.cast("double")
    approx = (
        F.when(
            (raw <= F.lit(prm["lc_threshold"])) & (v_empty > 0),
            F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / v_empty)),
        )
        .otherwise(F.round(raw))
        .cast("long")
        .alias("approx_distinct")
    )
    keep = list(group_cols) + (["n_exact"] if include_exact else [])
    return grouped.select(*keep, approx)


def hll_pairwise_overlap(
    df: DataFrame,
    *,
    type_col: str,
    value: Column | str,
    p: int = 8,
) -> DataFrame:
    """Distinct-overlap estimates for every unordered pair of types via
    sketch set algebra: |A ∩ B| ≈ E(A) + E(B) − E(A ∪ B), where the
    union sketch is just the register max of the two sides — no second
    data pass, no pairwise re-scan. One registers pass over the data;
    everything pairwise happens on O(types × 2^p) rows. The
    inclusion–exclusion estimate can be slightly negative for disjoint
    sets (estimator noise) — reported raw, not clamped.

    Output: (ta, tb, d_a, d_b, d_union, d_intersection).
    """
    # The register table feeds the singles, the pair expansion, AND the
    # type list — checkpoint it once (O(types x 2^p) rows) so the data
    # pass truly happens once instead of three times from lineage.
    regs = hll_registers(
        df, group_cols=[type_col], value=value, p=p
    ).localCheckpoint(eager=False)
    types = regs.select(F.col(type_col).alias("__t")).distinct()
    # Each register row feeds every pair its type belongs to; the
    # (pair, bucket) max dedups the two contributing sides into the
    # union sketch.
    pair_regs = (
        regs.join(types, F.col(type_col) != F.col("__t"))
        .select(
            F.least(type_col, "__t").alias("ta"),
            F.greatest(type_col, "__t").alias("tb"),
            "__hll_bucket",
            "__hll_m",
        )
        .groupBy("ta", "tb", "__hll_bucket")
        .agg(F.max("__hll_m").alias("__hll_m"))
    )
    singles = hll_estimate(regs, group_cols=[type_col], p=p)
    unions = hll_estimate(pair_regs, group_cols=["ta", "tb"], p=p).select(
        "ta", "tb", F.col("approx_distinct").alias("d_union")
    )
    a = singles.select(
        F.col(type_col).alias("ta"), F.col("approx_distinct").alias("d_a")
    )
    b = singles.select(
        F.col(type_col).alias("tb"), F.col("approx_distinct").alias("d_b")
    )
    return (
        unions.join(a, "ta")
        .join(b, "tb")
        .select(
            "ta",
            "tb",
            "d_a",
            "d_b",
            "d_union",
            (F.col("d_a") + F.col("d_b") - F.col("d_union")).alias(
                "d_intersection"
            ),
        )
    )


def hll_estimate_sql_expr(p: int) -> str:
    """SQL expression estimating distinct from ``__occ_sum`` /
    ``__occupied`` columns (the register-aggregate level) — the same
    literal-folded formula the Spark side runs, for composing oracles
    that estimate over DERIVED register sets (unions, windows)."""
    prm = hll_params(p)
    m, scale = prm["m"], prm["scale"]
    raw = (
        f"{prm['raw_num']!r} / CAST(__occ_sum + ({m} - __occupied) * "
        f"{scale} AS DOUBLE)"
    )
    return (
        f"CAST(round(CASE WHEN {raw} <= {prm['lc_threshold']!r} "
        f"AND ({m} - __occupied) > 0 "
        f"THEN {float(m)!r} * ln({float(m)!r} / ({m} - __occupied)) "
        f"ELSE {raw} END) AS BIGINT)"
    )


def _cms_bucket(value: Column, row: int, width: int) -> Column:
    """Row-salted md5 bucket — engine-portable like :func:`hll_hash`."""
    salted = F.concat(F.lit(f"{row}|"), value.cast("string"))
    return (
        F.conv(F.substring(F.md5(salted), 1, _HASH_HEX_CHARS), 16, 10).cast(
            "long"
        )
        % F.lit(width)
    )


def cms_counts(
    df: DataFrame,
    *,
    value: Column | str,
    depth: int = 2,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch of a value stream: (row, bucket, c).

    The item string never shuffles — each input row becomes ``depth``
    (row, bucket) int pairs and ONE groupBy produces the depth×width
    counter table (mergeable: counters add). This is the
    bounded-memory frequency structure for streams whose key
    cardinality is unbounded; point estimates are upward-biased only
    (min over rows bounds collisions)."""
    val = F.col(value) if isinstance(value, str) else value
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _cms_bucket(val, j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rb")
    )
    return pairs.groupBy(
        F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("c"))


def cms_point_estimate(
    candidates: DataFrame,
    cms: DataFrame,
    *,
    value: Column | str,
    depth: int = 2,
    width: int = 1024,
    out_col: str = "cms_estimate",
) -> DataFrame:
    """Estimated frequency for each candidate row: min over the sketch
    rows of the candidate's bucket counter. ``depth`` broadcast joins
    against the depth×width counter table (tiny by construction)."""
    val = F.col(value) if isinstance(value, str) else value
    out = candidates
    est_cols = []
    for j in range(depth):
        cj = cms.filter(F.col("row") == j).select(
            F.col("bucket").alias(f"__b{j}"), F.col("c").alias(f"__c{j}")
        )
        out = out.withColumn(f"__b{j}", _cms_bucket(val, j, width)).join(
            F.broadcast(cj), f"__b{j}", "left"
        )
        est_cols.append(F.coalesce(F.col(f"__c{j}"), F.lit(0)))
    keep = [c for c in candidates.columns]
    return out.select(
        *keep, F.least(*est_cols).cast("long").alias(out_col)
    )


def hll_distinct_oracle_sql(
    *,
    table_expr: str,
    group_cols: list[str],
    value_sql: str,
    p: int = 8,
    include_exact: bool = False,
) -> str:
    """ANSI/DuckDB SQL computing the IDENTICAL estimate (oracle)."""
    prm = hll_params(p)
    m, w_bits, scale = prm["m"], prm["w_bits"], prm["scale"]
    gcols = ", ".join(group_cols)
    gpfx = (gcols + ", ") if group_cols else ""
    exact_reg = (
        ", count(DISTINCT __v) AS __nd" if include_exact else ""
    )
    # CAST: DuckDB sum(BIGINT) is HUGEINT, which pandas renders as
    # float ("19810.0") and breaks string-wise result comparison.
    exact_out = (
        ", CAST(sum(__nd) AS BIGINT) AS n_exact" if include_exact else ""
    )
    exact_sel = ", CAST(({v}) AS VARCHAR) AS __v".format(v=value_sql) if include_exact else ""
    return f"""
    WITH hashed AS (
      SELECT {gpfx}
             ('0x' || substr(md5(CAST(({value_sql}) AS VARCHAR)), 1, {_HASH_HEX_CHARS}))::BIGINT AS __h
             {exact_sel}
      FROM {table_expr}
    ),
    regs AS (
      SELECT {gpfx} __h % {m} AS __bucket,
             max(CASE WHEN __h // {m} = 0 THEN {w_bits + 1}
                      ELSE {w_bits + 1} - length(bin(__h // {m})) END) AS __m
             {exact_reg}
      FROM hashed GROUP BY {gpfx} __h % {m}
    ),
    agg AS (
      SELECT {gpfx}
             sum(CAST(power(2, {w_bits + 1} - __m) AS BIGINT)) AS __occ_sum,
             count(*) AS __occupied
             {exact_out}
      FROM regs GROUP BY {gcols if gcols else "1=1"}
    )
    SELECT {gpfx}{("n_exact, " if include_exact else "")}
           CAST(round(CASE
             WHEN {prm["raw_num"]!r} / CAST(__occ_sum + ({m} - __occupied) * {scale} AS DOUBLE)
                    <= {prm["lc_threshold"]!r}
                  AND ({m} - __occupied) > 0
             THEN {float(m)!r} * ln({float(m)!r} / ({m} - __occupied))
             ELSE {prm["raw_num"]!r} / CAST(__occ_sum + ({m} - __occupied) * {scale} AS DOUBLE)
           END) AS BIGINT) AS approx_distinct
    FROM agg
    """
