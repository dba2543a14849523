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
) -> DataFrame:
    """Exact n-per-stratum sample, deterministic in (seed, ids).

    One shuffle on the strata; within each stratum rows rank by
    md5(seed|id) — a fixed pseudo-random order, so re-runs and
    different partitionings return the SAME sample (unlike
    ``df.sampleBy``, which is per-partition random and approximate).
    The rank window rides the strata partitioning.
    """
    rnd = F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string")))
    w = Window.partitionBy(*strata_cols).orderBy(rnd.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= n)
        .drop("__r")
    )


def pack_token_bins(
    df: DataFrame,
    *,
    token_col: str,
    budget: int,
    id_col: str,
    partition_col: str | Column | None = None,
) -> DataFrame:
    """Assign each document to a token-budget bin by running offset:
    bin = floor(start_offset / budget) over documents ordered by id.

    This is streaming offset-binning — the shape that packs a corpus
    into ~budget-token training shards in ONE window pass. A bin can
    overshoot the budget by at most one document (the doc straddling
    the boundary), which is the standard scale trade against exact
    first-fit packing (inherently sequential). With ``partition_col``
    the packing runs independently per partition (e.g. per language) —
    that is also what bounds window state at 100 TB: partition by
    shard/source so no single ordered window spans the corpus.

    Output: original columns + ``bin_id`` (long).
    """
    parts = [partition_col] if partition_col is not None else []
    w = Window.partitionBy(*parts).orderBy(F.col(id_col).asc())
    start = F.coalesce(
        F.sum(F.col(token_col)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return df.withColumn("bin_id", F.floor(start / F.lit(budget)))
