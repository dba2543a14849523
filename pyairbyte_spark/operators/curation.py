"""Dataset curation: stratified sampling and token-budget packing.

Training-data pipelines downsample per class/source and pack documents
into fixed token budgets. Both are expressed as deterministic window
plans (no RNG state, no UDFs) so runs are reproducible and the DuckDB
oracle can verify them exactly:

- sampling order = md5(seed || id) — a uniform, engine-portable
  pseudo-random permutation, stable across runs and partitionings;
- packing = running token offsets binned by budget.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sample_per_stratum(
    df: DataFrame,
    strata_cols: list[str],
    *,
    n: int,
    id_col: str,
    seed: str = "0",
    prefilter: bool = True,
) -> DataFrame:
    """Exact n-per-stratum sample, deterministic in (seed, ids).

    One shuffle on the strata; within each stratum rows rank by
    md5(seed|id) — a fixed pseudo-random order, so re-runs and
    different partitionings return the SAME sample (unlike
    ``df.sampleBy``, which is per-partition random and approximate).
    The rank window rides the strata partitioning.

    Giant-stratum guard (default on): a single huge stratum is ONE
    window partition — at 100 TB that task sorts (and spills) the
    whole stratum to pick n rows. With ``prefilter`` the plan first
    aggregates per-stratum counts (map-side partial, tiny output,
    AQE-broadcast back), then keeps only rows whose hash fraction
    ``u = md5[:15] / 16^15`` is below ``(8n+256)/M`` BEFORE the
    window — the expected surviving stratum is ~8n+256 rows whatever
    M is, so the sort is always small. The kept set is a superset of
    the n winners unless fewer than n of M rows land under the
    threshold, which by Chernoff has probability ≤ exp(-(7n+256)²/
    (2·(8n+256))) < 1e-56 — negligible at any stratum count. The
    md5-string order ties out with the numeric fraction (fixed-width
    lowercase hex compares lexicographically = numerically), so the
    selected rows are bit-identical with and without the guard.
    """
    rnd = F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string")))
    if prefilter:
        counts = df.groupBy(*strata_cols).agg(
            F.count(F.lit(1)).alias("__stratum_n")
        )
        # Null-safe join: Window.partitionBy treats NULL as a regular
        # stratum, so the count join must too — a plain equi-join would
        # silently drop every NULL-keyed row before the window.
        counts = counts.select(
            *[F.col(c).alias(f"__s_{c}") for c in strata_cols], "__stratum_n"
        )
        cond = None
        for c in strata_cols:
            eq = df[c].eqNullSafe(F.col(f"__s_{c}"))
            cond = eq if cond is None else (cond & eq)
        frac = F.least(
            F.lit(1.0), (F.lit(8.0 * n + 256.0) / F.col("__stratum_n"))
        )
        u = F.conv(F.substring(rnd, 1, 15), 16, 10).cast("double") / F.lit(
            float(16**15)
        )
        df = (
            df.join(counts, cond)
            .filter(u <= frac)
            .drop("__stratum_n", *[f"__s_{c}" for c in strata_cols])
        )
    w = Window.partitionBy(*strata_cols).orderBy(rnd.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= n)
        .drop("__r")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    chunk_tokens: int,
    stride: int | None = None,
    min_tokens: int = 1,
) -> DataFrame:
    """Split documents into fixed token windows with optional overlap —
    context-window chunking for training-sequence preparation.

    ``stride`` defaults to ``chunk_tokens`` (disjoint chunks); a smaller
    stride overlaps adjacent chunks by ``chunk_tokens - stride`` tokens.
    Output: (id, chunk_idx, chunk_text, n_chunk_tokens), one row per
    chunk; tail chunks shorter than ``min_tokens`` are dropped.

    Scale shape: per-row explode fan-out, no shuffle — the tokens array
    is materialized once behind a projection boundary (HOF lambdas are
    interpreted; inlining the split re-evaluates it per element).
    """
    if stride is None:
        stride = chunk_tokens
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    if stride > chunk_tokens:
        # Gaps between windows silently drop the tokens in between —
        # never what a training pipeline wants from a chunker.
        raise ValueError(
            f"stride ({stride}) > chunk_tokens ({chunk_tokens}) would skip tokens"
        )
    from pyairbyte_spark.operators.text import tokens_expr

    tdf = df.select(F.col(id_col), tokens_expr(text_col).alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    # The tokens array rides through the explode as a row-local column —
    # no rejoin, no shuffle.
    out = tdf.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_idx", "__start"),
        toks.alias("__toks"),
        n.alias("__n"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens)
    return (
        out.withColumn("chunk_text", F.concat_ws(" ", chunk))
        .withColumn(
            "n_chunk_tokens",
            F.least(F.lit(chunk_tokens), F.col("__n") - F.col("__start")),
        )
        .filter(F.col("n_chunk_tokens") >= min_tokens)
        .select(id_col, "chunk_idx", "chunk_text", "n_chunk_tokens")
    )


def mixture_weights(
    df: DataFrame,
    group_col: str,
    *,
    token_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based data-mixture resampling weights per group.

    Computes each group's token share p and the alpha-temperature
    target share q ∝ p^alpha (alpha < 1 flattens the mixture toward
    uniform — the multilingual/domain rebalancing rule). The resampling
    factor q/p is what a pipeline multiplies per-group sampling rates
    by. Two tiny aggregations; group count is bounded, so every
    intermediate is bounded metadata.
    """
    totals = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col).cast("long")).alias("total_tokens"),
    )
    # Grand totals as broadcast single-row aggregates, not a global
    # window — the per-group frame is tiny, but an unpartitioned Window
    # is a banned plan shape here (one-task funnel); broadcasts aren't.
    grand = totals.agg(F.sum("total_tokens").alias("__g"))
    with_p = totals.crossJoin(F.broadcast(grand)).withColumn(
        "__p", F.col("total_tokens") / F.col("__g")
    )
    norm = with_p.agg(F.sum(F.pow(F.col("__p"), F.lit(alpha))).alias("__z"))
    q = F.pow(F.col("__p"), F.lit(alpha)) / F.col("__z")
    return (
        with_p.crossJoin(F.broadcast(norm))
        .select(
            group_col,
            "n_docs",
            "total_tokens",
            F.round(F.col("__p"), 6).alias("token_share"),
            F.round(q, 6).alias("target_share"),
            F.round(q / F.col("__p"), 6).alias("resample_factor"),
        )
    )


def weighted_sample_per_stratum(
    df: DataFrame,
    strata_cols: list[str],
    *,
    n: int,
    weight_col: str,
    id_col: str,
    seed: str = "0",
) -> DataFrame:
    """Exact n-per-stratum sample with probability ∝ weight,
    deterministic in (seed, ids) — Efraimidis-Spirakis A-ES.

    Each row draws u = md5-uniform(seed|id) ∈ (0, 1] and ranks by
    key = ln(u)/w descending (the log-monotone form of u^(1/w)): the
    top n per stratum is then an exact weighted sample without
    replacement. Quality-weighted corpus downsampling ("keep 1M docs
    per language, preferring high quality") is this exact op with
    w = quality score.

    Same scale shape as :func:`sample_per_stratum`: one shuffle on the
    strata, rank window rides it. The key is rounded to 9 decimals
    (ties broken by id) so the last-ulp difference between engines'
    ``ln`` implementations can never reorder ranks — the DuckDB oracle
    reproduces the selection bit-for-bit. Rows with w ≤ 0 or NULL are
    excluded (zero weight = never sampled).
    """
    rnd = F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string")))
    # (0, 1]: conv of 15 hex chars is < 16^15, +1 keeps u strictly > 0.
    u = (F.conv(F.substring(rnd, 1, 15), 16, 10).cast("double") + F.lit(1.0)) / F.lit(
        float(16**15)
    )
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 9)
    w = Window.partitionBy(*strata_cols).orderBy(
        F.col("__k").desc(), F.col(id_col).asc()
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__k", key)
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= n)
        .drop("__k", "__r")
    )


def pack_token_bins(
    df: DataFrame,
    *,
    token_col: str,
    budget: int,
    id_col: str,
    partition_col: str | Column | None = None,
    num_shards: int | None = None,
) -> DataFrame:
    """Assign each document to a token-budget bin by running offset:
    bin = floor(start_offset / budget) over documents ordered by id.

    This is streaming offset-binning — the shape that packs a corpus
    into ~budget-token training shards. A bin can overshoot the budget
    by at most one document (the doc straddling the boundary), which is
    the standard scale trade against exact first-fit packing (inherently
    sequential). With ``partition_col`` the packing runs independently
    per partition (e.g. per language) and the running sum rides that
    partitioning in one window pass.

    Without ``partition_col`` the global running sum is computed with a
    TWO-PASS plan, never a global single-partition window:

    1. range-repartition by ``id_col`` into ``num_shards`` ordered
       shards (default ``spark.sql.shuffle.partitions``);
    2. aggregate per-shard token totals and collect them to the driver
       (bounded metadata: one row per shard) to build cumulative base
       offsets;
    3. broadcast-join the bases back and run a *partition-local* window
       per shard: ``start = shard_base + local_running_sum``.

    Every task therefore sees only its shard — the plan contains no
    unpartitioned Window and scales to arbitrary corpus size. The
    per-row offsets (and hence bin ids) are identical to the
    single-window formulation by construction: range shard p holds ids
    strictly before shard p+1's, so shard_base + local prefix sum IS
    the global prefix sum.

    Output: original columns + ``bin_id`` (long).
    """
    order = F.col(id_col).asc()
    if partition_col is not None:
        w = Window.partitionBy(partition_col).orderBy(order)
        start = F.coalesce(
            F.sum(F.col(token_col)).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        return df.withColumn("bin_id", F.floor(start / F.lit(budget)))

    spark = df.sparkSession
    if num_shards is None:
        # Scale shard count with the input (its current partition count —
        # proportional to bytes scanned) instead of a flat
        # shuffle.partitions: tiny inputs then pay a tiny pass-1 job,
        # while at cluster scale the input partition count IS the right
        # parallelism. Cap at shuffle.partitions so pass 1's driver
        # collect stays bounded metadata.
        shards = max(
            1,
            min(
                df.rdd.getNumPartitions(),
                int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
            ),
        )
    else:
        shards = num_shards
    ranged = (
        df.repartitionByRange(shards, F.col(id_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # one materialization feeds both passes
    )
    # Pass 1: per-shard totals -> driver (<= `shards` rows) -> cumulative bases.
    totals = {
        r["__pid"]: r["__tok"] or 0
        for r in ranged.groupBy("__pid")
        .agg(F.sum(F.col(token_col).cast("long")).alias("__tok"))
        .collect()
    }
    bases: list[tuple[int, int]] = []
    acc = 0
    for pid in sorted(totals):
        bases.append((pid, acc))
        acc += totals[pid]
    base_df = spark.createDataFrame(bases or [(0, 0)], "__pid int, __base long")
    # Pass 2: partition-local running sum + broadcast base offset.
    w = Window.partitionBy("__pid").orderBy(order)
    local = F.coalesce(
        F.sum(F.col(token_col)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return (
        ranged.join(F.broadcast(base_df), "__pid")
        .withColumn("bin_id", F.floor((F.col("__base") + local) / F.lit(budget)))
        .drop("__pid", "__base")
    )


def remove_repeated_spans(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    split_pattern: str = r"\n",
    join_sep: str = "\n",
    min_docs: int | None = 3,
    min_doc_frac: float | None = None,
) -> DataFrame:
    """Cross-document boilerplate removal (the C4 line-dedup rule):
    drop every span (line, by default) that occurs in at least
    ``min_docs`` distinct documents (or ``min_doc_frac`` of the corpus),
    then reassemble each document from its surviving spans in order.

    Plan shape, 100 TB-ready:

    1. one explode to (doc, pos, span);
    2. one distinct + groupBy(span) for the distinct-doc counts — the
       only full shuffle, and it is map-side combinable;
    3. the boilerplate set (spans OVER the threshold — small by
       definition: boilerplate is what repeats) broadcasts into a
       left-anti join, so the corpus is never shuffled a second time;
    4. reassembly groups by doc id and orders spans with an in-group
       ``array_sort`` — no window, no global sort.

    Output: ``id_col``, ``n_kept``, ``n_removed``, ``cleaned`` (the
    reassembled text; empty string when every span was boilerplate).
    """
    parts = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), split_pattern)).alias("pos", "span"),
    )
    counts = (
        parts.select(id_col, "span")
        .distinct()
        .groupBy("span")
        .agg(F.count(F.lit(1)).alias("__n_docs"))
    )
    if min_doc_frac is not None:
        total = df.select(
            F.count_distinct(F.col(id_col)).alias("__total")
        )
        bp = (
            counts.crossJoin(F.broadcast(total))
            .filter(F.col("__n_docs") >= F.lit(min_doc_frac) * F.col("__total"))
            .select("span")
        )
    else:
        bp = counts.filter(F.col("__n_docs") >= F.lit(min_docs)).select("span")
    kept = parts.join(F.broadcast(bp), "span", "left_anti")
    totals = parts.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n_spans"))
    cleaned = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            join_sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "span"))),
                lambda x: x["span"],
            ),
        ).alias("cleaned"),
    )
    return totals.join(cleaned, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        (F.col("__n_spans") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce(F.col("cleaned"), F.lit("")).alias("cleaned"),
    )
