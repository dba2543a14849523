"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
  set against the corpus; one pass, no corpus self-shuffle. The dot
  product is a JVM-side ``zip_with`` + ``aggregate`` fold — no UDF.
- ``lsh_bucketed_topk`` — the scale path: sign-quantization buckets
  (axis-aligned hyperplane LSH) shrink each query's candidate set to its
  bucket; recall trades against the number of sign bits.
- ``cosine_neardup_pairs`` — all-pairs above a threshold (small corpora /
  post-LSH verification).

Numeric portability: embeddings are cast float→double before the fold
(exact), and the fold is a sequential left-to-right sum — the same IEEE
operation order the DuckDB oracle's ``list_dot_product`` uses, so
results hash-match bit-for-bit.

At 100 TB: the corpus stays partitioned; queries broadcast. For huge
query sets, swap ``broadcast`` for a bucket-repartition join on the LSH
key (same code path, Catalyst picks SMJ).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double_vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (deterministic IEEE order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def sign_bucket_expr(col: Column | str, *, bits: int = 8) -> Column:
    """Axis-aligned sign-LSH bucket id: concat of (dim_i >= 0) bits for
    the first ``bits`` dimensions."""
    c = F.col(col) if isinstance(col, str) else col
    parts = [
        F.when(F.element_at(c, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(bits)
    ]
    return F.concat(*parts)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine) — cosine rounded to 6
    decimals; ranking ties broken by neighbor id (deterministic).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("cvec")
    ).withColumn("cnorm", norm_expr(F.col("cvec")))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("qvec")
    ).withColumn("qnorm", norm_expr(F.col("qvec")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_expr(F.col("qvec"), F.col("cvec"))
                / (F.col("qnorm") * F.col("cnorm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign
    bucket. Same output shape as ``brute_force_topk`` (recall < 1)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_vec(vec_col).alias("cvec"),
        sign_bucket_expr(vec_col, bits=bits).alias("bucket"),
    ).withColumn("cnorm", norm_expr(F.col("cvec")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_vec(vec_col).alias("qvec"),
        sign_bucket_expr(vec_col, bits=bits).alias("bucket"),
    ).withColumn("qnorm", norm_expr(F.col("qvec")))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_expr(F.col("qvec"), F.col("cvec"))
                / (F.col("qnorm") * F.col("cnorm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine ≥ threshold.

    Norms are computed ONCE per vector before the pair join (n folds),
    not per pair (n² folds) — a 3× cut in the dominant cost. The
    remaining per-pair work is a single dot-product fold.
    """
    base = df.select(F.col(id_col).alias("id"), as_double_vec(vec_col).alias("v"))
    base = base.select("id", "v", norm_expr(F.col("v")).alias("nrm"))
    a = base.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("norm_a")
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("norm_b")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot_expr(F.col("va"), F.col("vb")) / (F.col("norm_a") * F.col("norm_b")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
