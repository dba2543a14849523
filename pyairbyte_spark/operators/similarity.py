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

from pyspark.sql import Column, DataFrame, Row, Window
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


def _assign_vectorized(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment as one Arrow ``mapInPandas`` pass:
    per batch, ONE numpy GEMM V @ C.T against the collected (tiny)
    centroid matrix — O(n·k·d) in BLAS instead of n·k interpreted HOF
    folds, the difference between usable and unusable once k grows
    past a few dozen (auto-scaled SemDeDup). Same semantics as the
    expression path: cosine rounded to 6, ties → lowest cid (columns
    ordered by cid, argmax picks the first). BLAS vs sequential-fold
    summation differs ~1e-15, absorbed by the rounding — the same
    tolerance the pairwise tile kernel already accepts. Zero vectors
    deterministically take the lowest cid (norm guarded to 1)."""
    import numpy as np
    import pandas as pd

    cents = sorted(centroids.collect(), key=lambda r: r["cid"])
    cids = np.array([r["cid"] for r in cents])
    C = np.stack([np.asarray(r["cv"], dtype=np.float64) for r in cents])
    cn = np.sqrt(np.einsum("ij,ij->i", C, C))
    cn[cn == 0.0] = 1.0
    cid_t = centroids.schema["cid"].dataType.simpleString()
    id_t = vectors.schema["id"].dataType.simpleString()
    schema = f"id {id_t}, v array<double>, cid {cid_t}"

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64, copy=False)
            nv = np.sqrt(np.einsum("ij,ij->i", V, V))
            nv[nv == 0.0] = 1.0
            cos = np.round(V @ C.T / np.outer(nv, cn), 6)
            yield pd.DataFrame(
                {"id": pdf["id"], "v": pdf["v"], "cid": cids[cos.argmax(1)]}
            )

    return vectors.select("id", "v").mapInPandas(assign, schema)


def _assign_to_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    top_n: int = 1,
    vectorized: bool = False,
) -> DataFrame:
    """(id, v) × broadcast (cid, cv) → nearest ``top_n`` centroids per
    vector by cosine (round 6; ties → lowest cid). One pass, no
    corpus self-shuffle. ``vectorized`` swaps the interpreted HOF
    scoring for the numpy GEMM path (top_n=1 only) — callers opt in
    when the centroid count is large.

    Measured and rejected (r14): assigning via a PURE PROJECTION
    against literal centroid arrays (one struct per centroid,
    array_max to pick the winner) removes the cross join, the
    max_by aggregate and its exchange — 12 → 4 Exchanges on
    ann_ivf_topk — yet ran consistently SLOWER in a within-session
    interleaved A/B at sf0.1 (ann_ivf_topk 4.51s vs 2.91s,
    ann_ivf_sync_topk 10.52s vs 7.28s, medians of 4 alternating
    rounds): k interpreted HOF dot-folds stacked in ONE projection
    evaluate outside whole-stage codegen, costing more than the
    exchange they saved. The broadcast-join + map-side max_by below
    keeps the corpus unshuffled anyway (the only exchange carries
    one row per vector), so the join formulation stays."""
    if vectorized and top_n == 1:
        return _assign_vectorized(vectors, centroids)
    # Norms hoisted behind projection boundaries: HOF folds are
    # interpreted, so norm(v) inlined into the pair expression would
    # re-fold once per centroid (8x) instead of once per vector. The
    # division still sees norm(v)*norm(cv) in the same IEEE order, so
    # csim is bit-identical.
    vecs = vectors.withColumn("__nv", norm_expr(F.col("v")))
    cents = centroids.withColumn("__ncv", norm_expr(F.col("cv")))
    scored = (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn(
            "csim",
            F.round(
                dot_expr(F.col("v"), F.col("cv"))
                / (F.col("__nv") * F.col("__ncv")),
                6,
            ),
        )
        .drop("__nv", "__ncv")
    )
    if top_n == 1:
        # Argmin as a hash aggregate instead of a sort+window: partial
        # max_by combines map-side, so the exchange carries one row per
        # vector instead of one per (vector, centroid). The key struct
        # (csim, -cid) is unique per id, so ties still break to the
        # lowest cid — same result as the window path.
        best = scored.groupBy("id").agg(
            F.max_by(
                F.struct(F.col("cid"), F.col("v")),
                F.struct(F.col("csim"), (-F.col("cid")).alias("nc")),
            ).alias("b")
        )
        return best.select("id", F.col("b.v").alias("v"), F.col("b.cid").alias("cid"))
    w = Window.partitionBy("id").orderBy(F.col("csim").desc(), F.col("cid").asc())
    return (
        scored.withColumn("__cr", F.row_number().over(w))
        .filter(F.col("__cr") <= top_n)
        .drop("__cr", "cv", "csim")
    )


# Driver-side Lloyd: collect the (bounded) train sample once and run
# the iterations in numpy — 0 Spark jobs per iteration instead of the
# assign cross-join + two groupBys. Both formulations round every
# decision value (csim, centroid components) to 6 decimals, which is
# what makes them agree: the only divergence channel is a value within
# ~1e-15 of a 0.5e-6 rounding boundary (probability ~1e-10 per value;
# bit-equality of the final centroids is pinned by
# tests/test_operators-side equivalence and the full oracle sweep at
# three scale factors). False = always the distributed plan — the
# equality escape hatch.
KMEANS_DRIVER = True
# Train samples above this row count stay distributed (the collect is
# probed with LIMIT cap+1, so oversize corpora pay one incremental
# limit job, never a full collect). 64k rows x 64 dims ~ 34 MB.
KMEANS_DRIVER_MAX_TRAIN = int(
    __import__("os").environ.get("SPARK_GRAFT_KMEANS_DRIVER_MAX", "65536")
)


def _round6_vec(x):
    """Vectorized HALF_UP 6-decimal round matching Spark's
    ``round(double, 6)`` (BigDecimal HALF_UP, ties away from zero)."""
    import numpy as np

    return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6


def _lloyd_driver(
    rows: list, n_centroids: int, iters: int
) -> "list[tuple] | None":
    """numpy Lloyd over the collected train sample — the same
    seed-from-lowest-ids / cosine-assign (round 6, ties to lowest
    cid) / per-component mean (round 6) steps as the distributed
    plan. Returns [(cid, [components...])] sorted by cid, or None
    when the sample shape disqualifies the fast path (ragged or
    non-finite vectors)."""
    import numpy as np

    try:
        rows = sorted(rows, key=lambda r: r[0])
        ids = [r[0] for r in rows]
        mat = np.array([r[1] for r in rows], dtype=np.float64)
        if mat.ndim != 2 or not np.isfinite(mat).all():
            return None
    except Exception:
        return None
    seeds = list(range(min(n_centroids, len(rows))))
    cents = [(ids[i], mat[i].copy()) for i in seeds]
    norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
    if not (norms > 0).all():
        return None  # zero vector: csim division semantics differ
    for _ in range(iters):
        c_mat = np.array([cv for _, cv in cents])
        c_norm = np.sqrt(np.einsum("ij,ij->i", c_mat, c_mat))
        if not (c_norm > 0).all():
            return None
        # csim[i, j], rounded like the JVM expression; argmax takes the
        # FIRST max, and cents is cid-ascending, so ties break low.
        csim = _round6_vec(mat @ c_mat.T / np.outer(norms, c_norm))
        best = np.argmax(csim, axis=1)
        nxt = []
        for j, (cid, _) in enumerate(cents):
            members = mat[best == j]
            if len(members):
                nxt.append(
                    (cid, _round6_vec(members.sum(axis=0) / len(members)))
                )
        cents = nxt
        if not cents:
            return None
    return [(cid, [float(x) for x in cv]) for cid, cv in cents]


def kmeans_centroids(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    iters: int = 1,
    train_modulus: int = 1,
) -> DataFrame:
    """Deterministic coarse quantizer for IVF: centroids seeded from the
    ``n_centroids`` lowest-id vectors, refined by ``iters`` Lloyd
    iterations — each iteration is one broadcast-assign pass plus one
    posexplode/groupBy mean (shuffles rows×dim scalars, never vectors
    as blobs). Centroid components round to 6 decimals per iteration,
    which (a) makes the result independent of Spark's partial-sum
    order and (b) keeps the whole index SQL-expressible for the oracle.

    ``train_modulus=m`` trains Lloyd on the deterministic 1/m modulo
    sample (``id % m == 0``) instead of the full corpus — centroid
    quality needs a representative sample, not every vector, so the
    per-iteration assign pass and the rows×dim mean shuffle shrink m×.
    This is the standard IVF practice at scale (train on a slice, index
    everything); the sample predicate is SQL-expressible so the oracle
    stays exact.

    Returns (cid, cv). Runs as plain DataFrame ops — the iterative-
    algorithm pattern (loop in the driver, declarative plan per step).
    """
    e = corpus.select(
        F.col(id_col).alias("id"), as_double_vec(vec_col).alias("v")
    )
    train = e if train_modulus <= 1 else e.filter(F.col("id") % train_modulus == 0)
    centroids = (
        train.orderBy("id")
        .limit(n_centroids)
        .select(F.col("id").alias("cid"), F.col("v").alias("cv"))
    )
    if KMEANS_DRIVER:
        # One incremental-limit collect; if it truncates (train larger
        # than the cap) the sample is discarded and the distributed
        # plan below runs unchanged.
        try:
            sample = train.limit(KMEANS_DRIVER_MAX_TRAIN + 1).collect()
        except Exception:
            sample = None
        if sample is not None and len(sample) <= KMEANS_DRIVER_MAX_TRAIN:
            got = _lloyd_driver(
                [(r["id"], r["v"]) for r in sample], n_centroids, iters
            )
            if got is not None:
                spark = corpus.sparkSession
                out = spark.createDataFrame(
                    [(cid, cv) for cid, cv in got],
                    schema=centroids.schema,
                )
                # Callers that materialize the (tiny) centroid table
                # can take the rows without another collect.
                out._sg_local_rows = [
                    Row(cid=cid, cv=cv) for cid, cv in got
                ]
                return out
    # Large centroid sets: score Lloyd's assign pass in BLAS, not
    # interpreted HOF folds (n·k cost either way; ~100× constant gap).
    vec = n_centroids > 32
    for _ in range(iters):
        asg = _assign_to_centroids(train, centroids, vectorized=vec)
        means = (
            asg.select("cid", F.posexplode(F.col("v")).alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
        )
        centroids = means.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("cv")
        )
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    n_probes: int = 2,
    iters: int = 1,
    train_modulus: int = 1,
) -> DataFrame:
    """IVF approximate top-k: corpus rows attach to their nearest
    centroid (the inverted lists); each query probes its ``n_probes``
    nearest lists and ranks only those candidates. Candidates shrink
    ~n_probes/n_centroids vs brute force; recall trades against
    ``n_probes``. Same output shape as ``brute_force_topk``.

    Cost model: the index build is O(corpus) — one Lloyd pass over the
    ``train_modulus`` sample plus one full-corpus list assignment — and
    the payoff is per-query (each probe scores ~n_probes/n_centroids of
    the corpus). With a handful of queries brute force wins at any
    corpus size; IVF amortizes over QUERY VOLUME, which is why the
    lists would be materialized once and reused in production.

    At 100 TB: centroids broadcast (tiny), the corpus partitions by
    cid once and both the index build and every probe reuse that
    partitioning; probe joins hash on cid, so a query set of any size
    scales out without touching non-probed lists; Lloyd trains on the
    modulo sample, never the full corpus.
    """
    cent = kmeans_centroids(
        corpus,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_centroids,
        iters=iters,
        train_modulus=train_modulus,
    )
    # Materialize the centroid table (C rows × dim — tiny at ANY corpus
    # scale, by construction): the Lloyd-iteration subplan would
    # otherwise re-execute once per consumer (corpus assignment AND
    # query probing). This is dimension-table materialization, not a
    # data collect.
    spark = corpus.sparkSession
    cent_rows = getattr(cent, "_sg_local_rows", None) or cent.collect()
    cent = spark.createDataFrame(cent_rows, schema=cent.schema)
    e = corpus.select(F.col(id_col).alias("id"), as_double_vec(vec_col).alias("v"))
    lists = _assign_to_centroids(e, cent).select(
        F.col("cid"), F.col("id").alias("neighbor_id"), F.col("v").alias("cvec")
    )
    q = queries.select(F.col(id_col).alias("id"), as_double_vec(vec_col).alias("v"))
    probes = _assign_to_centroids(q, cent, top_n=n_probes).select(
        F.col("cid"), F.col("id").alias("query_id"), F.col("v").alias("qvec")
    )
    # Same norm-hoisting as _assign_to_centroids: one fold per list
    # row / probe row instead of one per joined pair.
    lists = lists.withColumn("__cn", norm_expr(F.col("cvec")))
    probes = probes.withColumn("__qn", norm_expr(F.col("qvec")))
    scored = (
        lists.join(F.broadcast(probes), "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_expr(F.col("qvec"), F.col("cvec"))
                / (F.col("__qn") * F.col("__cn")),
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


def quantize_int8(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: q_i =
    round(x_i * 127 / max|x|). Returns (``id_col``, scale, q) where
    ``scale`` is the per-vector max-abs and ``q`` an array<int> in
    [-127, 127] — a 4× (fp32) / 8× (fp64) storage cut for embedding
    tables, the standard first rung before product quantization.

    Pure JVM-side HOF expressions (transform/aggregate folds): no
    shuffle, no UDF — at 100 TB this is a map-only column rewrite that
    parquet scans push straight through. Zero vectors quantize to zero
    (guarded division).
    """
    v = as_double_vec(vec_col)
    scale = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    out = df.select(F.col(id_col), v.alias("__v"), scale.alias("scale"))
    q = F.transform(
        F.col("__v"),
        lambda x: F.when(F.col("scale") == 0.0, F.lit(0))
        .otherwise(F.round(x * 127.0 / F.col("scale")).cast("int")),
    )
    return out.select(F.col(id_col), F.col("scale"), q.alias("q"))


def semantic_dedup(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | None = None,
    iters: int = 1,
    threshold: float = 0.45,
    train_modulus: int = 1,
) -> DataFrame:
    """Semantic dedup in the SemDeDup shape (Abbas et al. 2023,
    arXiv:2303.09540): k-means the embedding space with the same
    deterministic quantizer IVF uses, score pairwise cosine ONLY inside
    each cluster, and mark every vector that has a >=threshold neighbor
    with a lower id in its cluster as a semantic duplicate.

    Keep rule: lowest id per duplicate group (the paper keeps the
    exemplar with lowest centroid similarity; lowest-id is deterministic
    and needs no extra ranking pass — swap the pair predicate to change
    policy).

    Returns (``id_col``, cluster_id, is_duplicate) — one row per input
    vector; filter ``~is_duplicate`` for the surviving corpus.

    At 100 TB: centroids broadcast (tiny by construction); the corpus
    shuffles once on cluster id; quadratic pair scoring is confined to
    single clusters — the SemDeDup contract is that cluster count grows
    with the corpus so per-cluster candidate sets stay bounded. No
    global window, no driver-side loop over vectors.

    ``n_clusters=None`` (default) auto-scales to ``max(8, isqrt(n))``
    — the round-4 100× stress finding: a FIXED cluster count lets
    per-cluster pairwise work grow quadratically with the corpus.
    Total cost ≈ assignment n·k + pairwise n²/k, minimized at
    k ∝ √n, which keeps expected per-cluster pairwise work LINEAR in
    n (cluster size √n). Deterministic: the count and the quantizing
    Lloyd seed are functions of the data alone. Pass an explicit
    ``n_clusters`` to pin behavior (the oracle query does).
    """
    if n_clusters is None:
        import math

        n_clusters = max(8, math.isqrt(max(corpus.count(), 1)))
    cent = kmeans_centroids(
        corpus,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_clusters,
        iters=iters,
        train_modulus=train_modulus,
    )
    # Materialize the (tiny) centroid table once — the Lloyd subplan
    # would otherwise re-execute for each consumer branch below.
    spark = corpus.sparkSession
    cent_rows = getattr(cent, "_sg_local_rows", None) or cent.collect()
    cent = spark.createDataFrame(cent_rows, schema=cent.schema)
    e = corpus.select(F.col(id_col).alias("id"), as_double_vec(vec_col).alias("v"))
    # (id, v, cid); GEMM-scored at EVERY k — the downstream pairwise
    # pass is already an Arrow/numpy job, so the Python workers are
    # warm and the batch transpose is paid anyway. Interleaved A/B at
    # sf0.1 (pinned k=8): 1.57 -> 1.17s median, every sample faster;
    # assignment equality vs the HOF fold proven on the real
    # embeddings at k=8/16 (round-6 absorbs the BLAS-vs-sequential
    # ulp, the tolerance the tile kernel already accepts). The ivf
    # build/probe sites keep the >32 gate: the same A/B measured
    # their small-k GEMM within noise (mapInPandas overhead cancels
    # the HOF savings when no other Python pass runs in the plan).
    asg = _assign_to_centroids(e, cent, vectorized=True)
    # Within-cluster pair scoring as tiled numpy matmuls inside ONE
    # applyInPandas pass per cluster — the blocked-GEMM shape
    # cosine_neardup_pairs uses. A join + interpreted HOF fold computes
    # the same pairs ~20x slower (measured 42s -> 2s at 20k vectors) and
    # its cost explodes with cluster size. Tiles bound memory at
    # ~2·tile²·8 bytes regardless of cluster size; pairwise-BLAS vs
    # sequential-fold summation differs ~1e-15, absorbed by round(…,6).
    import numpy as np
    import pandas as pd

    id_field = corpus.schema[id_col].dataType.simpleString()
    out_schema = (
        f"id {id_field}, cid {id_field}, is_duplicate boolean"
    )
    tile = 2048

    def mark_cluster_dups(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")
        ids = pdf["id"].to_numpy()
        V = np.stack(pdf["v"].to_numpy()).astype(np.float64, copy=False)
        norms = np.sqrt(np.einsum("ij,ij->i", V, V))
        dup = np.zeros(len(ids), dtype=bool)
        # ids sorted ascending → "has a lower-id >= threshold neighbor"
        # = any hit strictly above the diagonal, tile by tile.
        for j0 in range(0, len(ids), tile):
            Vj, nj = V[j0 : j0 + tile], norms[j0 : j0 + tile]
            for i0 in range(0, j0 + 1, tile):
                Vi, ni = V[i0 : i0 + tile], norms[i0 : i0 + tile]
                cos = np.round(Vi @ Vj.T / np.outer(ni, nj), 6)
                if i0 == j0:
                    # Diagonal tile: only strictly-upper pairs count.
                    cos[np.tril_indices(cos.shape[0], m=cos.shape[1])] = (
                        -2.0
                    )
                hit_cols = np.nonzero((cos >= threshold).any(axis=0))[0]
                dup[j0 + hit_cols] = True
        return pd.DataFrame(
            {"id": ids, "cid": pdf["cid"].to_numpy(), "is_duplicate": dup}
        )

    return asg.groupBy("cid").applyInPandas(mark_cluster_dups, out_schema).select(
        F.col("id").alias(id_col),
        F.col("cid").alias("cluster_id"),
        F.col("is_duplicate"),
    )


def cosine_neardup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    block_target_rows: int = 1024,
    allow_quadratic: bool = False,
    max_shuffled_rows: int = 500_000_000,
) -> DataFrame:
    """All pairs (id_a < id_b) with round(cosine, 6) ≥ threshold.

    Blocked-GEMM plan: vectors are hashed into B ≈ n/block_target blocks;
    each of the B(B+1)/2 block pairs becomes one cogroup, and inside the
    group a vectorized numpy matmul scores the m_i × m_j pair tile in one
    BLAS call. This replaces the n² per-pair expression folds of a naive
    cross join with n·B shuffled rows and dense tile math — the shape
    that holds at 100 TB (no driver collect, no broadcast-size ceiling;
    tiles stream through Arrow with bounded memory ≈ 2·block_target·dim
    doubles + the tile's hit list).

    Numerics: dot products accumulate in double; pairwise-BLAS summation
    differs from a sequential fold by ~1e-15 relative, ~9 orders below
    the 1e-6 rounding quantum, so results still hash-match the DuckDB
    oracle's ``list_dot_product`` fold after round(…, 6).

    **This operator is O(n²) in compute by definition** (every pair is
    scored; only the constant is tamed). The blocked plan shuffles
    ~n·B/2 replicated rows (B = n/block_target), which crosses from
    "expensive" to "cluster-killing" somewhere around n in the tens of
    millions. The guard estimates the shuffled-row count up front and
    raises with a pointer to the sub-quadratic operators
    (:func:`semantic_dedup` / MinHash-LSH in ``operators/dedup.py``)
    unless ``allow_quadratic=True`` — all-pairs-above-threshold should
    be a deliberate choice at scale, not a default someone inherits.
    """
    import math

    import numpy as np
    import pandas as pd

    n = df.count()  # parquet metadata count — no data scan
    num_blocks = max(1, math.ceil(n / block_target_rows))
    est_shuffled = n * (num_blocks + 1)  # both replicated sides
    if not allow_quadratic and est_shuffled > max_shuffled_rows:
        raise ValueError(
            f"cosine_neardup_pairs would shuffle ~{est_shuffled:,} "
            f"replicated rows for n={n:,} (all-pairs is O(n^2) "
            "compute). For near-duplicate detection at this scale use "
            "semantic_dedup() or MinHash-LSH (operators/dedup.py) — "
            "or pass allow_quadratic=True (and consider raising "
            "block_target_rows) if the full pair set is genuinely "
            "required."
        )

    base = df.select(
        F.col(id_col).alias("id"), as_double_vec(vec_col).alias("v")
    ).withColumn("blk", F.pmod(F.hash(F.col("id")), F.lit(num_blocks)))
    # A-side owns tile rows for every tile (blk, j≥blk); B-side owns tile
    # columns for every tile (i≤blk, blk). Replication factor ~B/2.
    left = base.withColumn(
        "kb", F.explode(F.sequence(F.col("blk"), F.lit(num_blocks - 1)))
    ).select(F.col("blk").alias("ka"), "kb", "id", "v")
    # Right-side payload columns renamed: a self-cogroup with identical
    # column names on both sides gets the non-key columns pruned off the
    # right frame (attribute dedup), so the tile fn would see only keys.
    right = base.withColumn(
        "ka", F.explode(F.sequence(F.lit(0), F.col("blk")))
    ).select(
        "ka",
        F.col("blk").alias("kb"),
        F.col("id").alias("rid"),
        F.col("v").alias("rv"),
    )

    id_field = df.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_field}, id_b {id_field}, cosine double"

    def score_tile(key: tuple, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty or rpdf.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        va = np.stack(lpdf["v"].to_numpy()).astype(np.float64, copy=False)
        vb = np.stack(rpdf["rv"].to_numpy()).astype(np.float64, copy=False)
        dots = va @ vb.T
        cos = np.round(
            dots
            / np.outer(
                np.sqrt(np.einsum("ij,ij->i", va, va)),
                np.sqrt(np.einsum("ij,ij->i", vb, vb)),
            ),
            6,
        )
        ida = lpdf["id"].to_numpy()
        idb = rpdf["rid"].to_numpy()
        if key[0] == key[1]:
            # Diagonal tile: both sides are the same block; the < mask
            # keeps each unordered pair exactly once.
            hit_r, hit_c = np.nonzero(
                (ida[:, None] < idb[None, :]) & (cos >= threshold)
            )
            lo, hi = ida[hit_r], idb[hit_c]
        else:
            # Off-diagonal tile: blocks are disjoint, so each unordered
            # pair appears exactly once — but the smaller id may sit on
            # EITHER side. Emit normalized (min, max); a plain < mask
            # here would silently drop the pairs whose smaller id lives
            # in the higher-numbered block.
            hit_r, hit_c = np.nonzero(cos >= threshold)
            a, b = ida[hit_r], idb[hit_c]
            swap = a > b
            lo = np.where(swap, b, a)
            hi = np.where(swap, a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": cos[hit_r, hit_c]})

    return (
        left.groupBy("ka", "kb")
        .cogroup(right.groupBy("ka", "kb"))
        .applyInPandas(score_tile, schema=out_schema)
    )


# -- persistent IVF index (commit-log store) --------------------------------


def build_ivf_index(
    corpus: DataFrame,
    store,
    index_name: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    iters: int = 1,
    train_modulus: int = 1,
    target_files: int | None = None,
    source_table: str | None = None,
    synced_version: int | None = None,
    source_ref: str | None = None,
    source_ref_id: str | None = None,
) -> dict:
    """Materialize an IVF index INTO a :class:`CommitLogTableStore`:
    ``<index_name>_centroids`` (the coarse quantizer),
    ``<index_name>_lists`` (one row per corpus vector with its ``cid``,
    plus ``sign``/``seq`` for the sign-tombstone maintenance the other
    derived indexes use), and ``<index_name>_meta`` (assignment
    parameters + the CDF provenance cursor), lists compacted with
    ``sort_by=["cid"]`` so every list occupies a contiguous file range
    and the manifest's zone maps prune probes to exactly the touched
    lists' files.

    This is the production answer to IVF's O(corpus) build cost (see
    :func:`ivf_topk`): build once per corpus refresh, then every
    :func:`ivf_index_topk` probe is a stats-pruned scan of
    ~n_probes/n_centroids of the index files — the ANN analogue of
    partition pruning, amortized over query volume. ``source_table`` /
    ``synced_version`` / ``source_ref`` record provenance for
    :func:`sync_ivf_index` — use :func:`attach_ivf_index` rather than
    passing them directly. Returns ``{"n_vectors", "n_centroids",
    "files"}``.
    """
    spark = corpus.sparkSession
    cent = kmeans_centroids(
        corpus,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_centroids,
        iters=iters,
        train_modulus=train_modulus,
    )
    from pyairbyte_spark.writers import LocalRows

    cent_rows = getattr(cent, "_sg_local_rows", None) or cent.collect()
    cent = spark.createDataFrame(cent_rows, schema=cent.schema)
    e = corpus.select(F.col(id_col).alias("id"), as_double_vec(vec_col).alias("v"))
    lists = _assign_to_centroids(
        e, cent, vectorized=n_centroids > 32
    )
    # centroids are already driver-resident: stage without a Spark job
    store.write_replace(
        LocalRows(
            [tuple(r) for r in cent_rows], cent.schema
        ),
        f"{index_name}_centroids",
    )
    # One clustered write: lists land range-partitioned on cid with
    # the sorted_by stamp AND the cluster_by property in a single
    # staged write + commit (was write → compact rewrite → property
    # commit: every byte written twice). target_files sets zone-map
    # granularity (aim for >= n_centroids so each list owns files);
    # appended vectors still range-sort on cid at staging, so probe
    # pruning never decays between refreshes.
    store.write_replace_clustered(
        lists.select(
            "cid",
            F.col("id"),
            F.col("v"),
            F.lit(1).cast("long").alias("sign"),
            F.lit(0).cast("long").alias("seq"),
        ),
        f"{index_name}_lists",
        cluster_by=["cid"],
        target_files=target_files,
    )
    # driver-resident meta row: staged without a Spark job
    meta = LocalRows(
        [
            (
                id_col,
                vec_col,
                int(n_centroids),
                int(iters),
                int(train_modulus),
                source_table,
                synced_version,
                source_ref,
                source_ref_id,
            )
        ],
        "id_col string, vec_col string, n_centroids int, iters int, "
        "train_modulus int, source_table string, synced_version long, "
        "source_ref string, source_ref_id string",
    )
    store.write_replace(meta, f"{index_name}_meta")
    plan = store.plan_scan(f"{index_name}_lists")
    st = store.table_stats(f"{index_name}_lists")
    return {
        "n_vectors": st["rows"],
        # the centroid rows are driver-resident — len(), not a count job
        "n_centroids": len(cent_rows),
        "files": plan["files_total"],
    }


def ivf_index_topk(
    store,
    index_name: str,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probes: int = 2,
) -> DataFrame:
    """Query a :func:`build_ivf_index` index: assign each query to its
    ``n_probes`` nearest centroids, then scan ONLY the probed lists —
    ``read_where(cid IN probes)`` rides the manifest zone maps, so the
    files of unprobed lists are never opened (plan-gated in
    ``tests/test_operators.py``). Output matches :func:`ivf_topk`
    (query_id, neighbor_id, cosine, rank) exactly for the same build
    parameters.

    The probed-cid set crosses the driver, bounded by
    |queries| × n_probes — query batches are small by definition
    (retrieval workloads); corpus-scale joins stay in the lists scan.
    """
    spark = queries.sparkSession
    cent = getattr(store, "read_local_df", lambda t: None)(
        f"{index_name}_centroids"
    )
    if cent is None:
        cent = spark.createDataFrame(
            store.read(f"{index_name}_centroids").collect()
        )
    q = queries.select(F.col(id_col).alias("id"), as_double_vec(vec_col).alias("v"))
    # Materialize once: probes feeds the cid collection AND the
    # broadcast join below — without this the whole assignment
    # aggregate re-executes per consumer (the minhash probe's cand
    # pattern). The cid set crosses the driver as ONE partial+final
    # aggregation, not a row collect.
    probes = (
        _assign_to_centroids(q, cent, top_n=n_probes)
        .select(
            F.col("cid"), F.col("id").alias("query_id"), F.col("v").alias("qvec")
        )
        .localCheckpoint(eager=False)
    )
    probe_cids = sorted(
        probes.agg(F.collect_set("cid")).collect()[0][0]
    )
    lists = store.read_where(f"{index_name}_lists", [("cid", "in", probe_cids)])
    # Sign-tombstone fold (sync_ivf_index retracts deleted/updated
    # vectors by appending their rows negated): a (cid, id) is live iff
    # its signs net positive; an updated vector scores with its NEWEST
    # positive row. Skipped entirely when the manifest's zone maps
    # prove min(sign) >= 0 over every live file (fresh builds,
    # post-fold) — the same metadata fast path the MinHash probe uses.
    if "sign" in lists.columns and _lists_have_tombstones(store, index_name):
        net = Window.partitionBy("cid", "id")
        newest = Window.partitionBy("cid", "id").orderBy(F.desc("seq"))
        lists = (
            lists.withColumn("__s", F.sum("sign").over(net))
            .filter((F.col("__s") > 0) & (F.col("sign") > 0))
            .withColumn("__rn", F.row_number().over(newest))
            .filter(F.col("__rn") == 1)
        )
    lists = lists.select(
        "cid", F.col("id").alias("neighbor_id"), F.col("v").alias("cvec")
    )
    lists = lists.withColumn("__cn", norm_expr(F.col("cvec")))
    probes = probes.withColumn("__qn", norm_expr(F.col("qvec")))
    scored = (
        lists.join(F.broadcast(probes), "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_expr(F.col("qvec"), F.col("cvec"))
                / (F.col("__qn") * F.col("__cn")),
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


def append_to_ivf_index(
    new_vectors: DataFrame,
    store,
    index_name: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    txn: tuple[str, int] | None = None,
    allow_oob: bool = False,
) -> dict:
    """Incremental index maintenance: assign ``new_vectors`` to the
    EXISTING coarse quantizer and append them to the lists table —
    O(new vectors), no rebuild (the standard IVF practice: centroids
    drift slowly; re-run :func:`build_ivf_index` on the retrain
    cadence, append between). The append lands as one commit; probes
    see old + new atomically. Fresh appends aren't cid-clustered until
    the next ``compact(sort_by=["cid"])`` — zone maps still prune them
    (each appended file knows its cid range), just more coarsely.
    ``txn=(app_id, batch_id)`` makes the append EXACTLY ONCE (the
    SetTransaction watermark rides the data commit) — the hook
    ``VectorIndexStreamingSink`` uses for stream-maintained indexes.
    Returns ``{"appended", "version", "skipped"}``.

    ATTACHED indexes (meta records a ``source_table``) refuse
    out-of-band appends unless ``allow_oob=True``, which records
    ``oob_appends`` in the meta BEFORE the data append (flag-first is
    fail-safe: a crash in between leaves only a spurious flag, which
    costs sync speed, never correctness) and switches every later
    :func:`sync_ivf_index` to exact netted index-side retraction
    derivation — see ``search._guard_oob_append``.
    """
    from pyairbyte_spark.operators.search import _guard_oob_append

    m = _ivf_index_meta(store, index_name)
    flag = _guard_oob_append(
        store,
        index_name,
        m,
        allow_oob,
        label="ivf index",
        sync_fn="sync_ivf_index",
    )
    if flag is not None:
        store.write_replace(flag, f"{index_name}_meta")
    spark = new_vectors.sparkSession
    cent = getattr(store, "read_local_df", lambda t: None)(
        f"{index_name}_centroids"
    )
    if cent is None:
        cent = spark.createDataFrame(
            store.read(f"{index_name}_centroids").collect()
        )
    e = new_vectors.select(
        F.col(id_col).alias("id"), as_double_vec(vec_col).alias("v")
    )
    # the meta already records the centroid count — no count job
    asg = _assign_to_centroids(
        e, cent, vectorized=int(m["n_centroids"]) > 32
    )
    cols = [F.col("cid"), F.col("id"), F.col("v")]
    if "sign" in store.table_columns(f"{index_name}_lists"):
        cols += [
            F.lit(1).cast("long").alias("sign"),
            F.lit(0).cast("long").alias("seq"),
        ]
    res = store.write_append(
        asg.select(*cols), f"{index_name}_lists", txn=txn
    )
    skipped = bool((res or {}).get("skipped"))
    return {
        "appended": 0 if skipped else new_vectors.count(),
        "version": (res or {}).get(
            "version", store.latest_version(f"{index_name}_lists")
        ),
        "skipped": skipped,
    }


def _ivf_index_meta(store, index_name: str) -> dict:
    # 1-row protocol table: the driver-local read answers without a
    # Spark job; any precondition miss falls back to the full read.
    rows = getattr(store, "read_rows_local", lambda t: None)(
        f"{index_name}_meta"
    )
    if rows:
        return rows[0]
    return store.read(f"{index_name}_meta").collect()[0].asDict()


def _lists_have_tombstones(store, index_name: str) -> bool:
    """True unless the lists manifest's zone maps PROVE min(sign) >= 0
    over every live file — one O(manifest) metadata read (the MinHash
    probe's fast-path check, for IVF). The proof requires every live
    file to carry a sign stat (statted-file count == file count)."""
    st = store.table_stats(f"{index_name}_lists")
    sign = (st.get("columns") or {}).get("sign")
    return not (
        sign is not None
        and sign.get("min") is not None
        and sign["min"] >= 0
        and st.get("files") is not None
        and sign.get("files") == st["files"]
    )


def ivf_index_debt(store, index_name: str) -> dict:
    """Tombstone debt of a sync-maintained IVF index: the fraction of
    lists rows that are retractions or retracted (probes fold them out,
    paying per probed row until :func:`fold_ivf_index`). Metadata-only
    when the zone maps prove the index tombstone-free; one aggregate
    otherwise."""
    if "sign" not in store.table_columns(f"{index_name}_lists"):
        # pre-r12 index: no tombstone machinery at all
        st = store.table_stats(f"{index_name}_lists")
        return {"rows": st.get("rows"), "tombstone_fraction": 0.0}
    if not _lists_have_tombstones(store, index_name):
        st = store.table_stats(f"{index_name}_lists")
        return {"rows": st.get("rows"), "tombstone_fraction": 0.0}
    g = (
        store.read(f"{index_name}_lists")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum((F.col("sign") < 0).cast("long")).alias("neg"),
        )
        .collect()[0]
    )
    rows = int(g["rows"] or 0)
    # every −1 row cancels one +1 row: debt = 2·neg/total
    debt = (2.0 * int(g["neg"] or 0) / rows) if rows else 0.0
    return {"rows": rows, "tombstone_fraction": debt}


def attach_ivf_index(
    store,
    table_name: str,
    index_name: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    iters: int = 1,
    train_modulus: int = 1,
    target_files: int | None = None,
    ref: str | None = None,
) -> dict:
    """Build the IVF index FROM a store table and record the snapshot
    version it covers — :func:`sync_ivf_index` then maintains it from
    the table's change feed, completing the follows-source-DML
    lifecycle for the vector index family (the text/MinHash pattern).
    ``ref`` attaches to a BRANCH (write-audit-publish): the index
    follows the branch and re-homes onto main at the first sync after
    the publish. Index tables live on main — ``store`` must be the
    main view."""
    if getattr(store, "_branch", None) is not None:
        raise ValueError(
            "attach from the MAIN view (pass ref=... to follow a "
            "branch); index tables live on main"
        )
    ref_id = None
    src = store
    if ref is not None:
        src = store.branch(ref)
        ref_id = src._branch_info(table_name)["id"]
    v = src.latest_version(table_name)
    return build_ivf_index(
        src.read_version(table_name, v),
        store,
        index_name,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_centroids,
        iters=iters,
        train_modulus=train_modulus,
        target_files=target_files,
        source_table=table_name,
        synced_version=v,
        source_ref=ref,
        source_ref_id=ref_id,
    )


def _ivf_rebuild(store, table, index_name, m, ref):
    attach_ivf_index(
        store,
        table,
        index_name,
        id_col=m["id_col"],
        vec_col=m["vec_col"],
        n_centroids=m["n_centroids"],
        iters=m["iters"],
        train_modulus=m["train_modulus"],
        ref=ref,
    )


def _ivf_sync_plan(ctx) -> dict:
    """IVF-family row derivation for ``search._sync_derived_index``:
    deleted/updated vectors retract as NEGATED list rows — the old
    snapshot's vectors re-assigned to the FROZEN quantizer, so the
    retraction lands in exactly the cid their build/append row occupies
    (netted sum(sign) per (cid, id) on the fallback, covering
    out-of-band duplicate appends); inserts/updates append rows stamped
    ``seq = head`` (probes score each live id's newest positive row).
    The quantizer stays frozen across syncs (standard IVF practice);
    ``index_health(kind="ivf")`` is the retrain trigger."""
    m, index_name, head = ctx.m, ctx.index_name, ctx.head
    id_col, vec_col = m["id_col"], m["vec_col"]
    cent = getattr(ctx.store, "read_local_df", lambda t: None)(
        f"{index_name}_centroids"
    )
    if cent is None:
        cent = ctx.spark.createDataFrame(
            ctx.store.read(f"{index_name}_centroids").collect()
        )
    vectorized = int(m["n_centroids"]) > 32
    if ctx.old_removed is not None:
        tombstones = _assign_to_centroids(
            ctx.old_removed.select(
                F.col(id_col).alias("id"), as_double_vec(vec_col).alias("v")
            ),
            cent,
            vectorized=vectorized,
        ).select(
            "cid",
            "id",
            "v",
            F.lit(-1).cast("long").alias("sign"),
            F.lit(int(head)).cast("long").alias("seq"),
        )
    else:
        tombstones = (
            ctx.store.read(f"{index_name}_lists")
            .join(ctx.removed, "id", "left_semi")
            .groupBy("cid", "id")
            .agg(F.sum("sign").alias("__s"), F.first("v").alias("v"))
            .filter(F.col("__s") > 0)
            .select(
                "cid",
                "id",
                "v",
                (-F.col("__s")).cast("long").alias("sign"),
                F.lit(int(head)).cast("long").alias("seq"),
            )
        )
    new_rows = _assign_to_centroids(
        ctx.added.select(
            F.col(id_col).alias("id"), as_double_vec(vec_col).alias("v")
        ),
        cent,
        vectorized=vectorized,
    ).select(
        "cid",
        "id",
        "v",
        F.lit(1).cast("long").alias("sign"),
        F.lit(int(head)).cast("long").alias("seq"),
    )
    from pyairbyte_spark.writers import LocalRows

    # driver-resident meta row: staged without a Spark job
    meta = LocalRows(
        [
            (
                id_col,
                vec_col,
                int(m["n_centroids"]),
                int(m["iters"]),
                int(m["train_modulus"]),
                ctx.table,
                head,
                ctx.ref,
                ctx.ref_id,
                ctx.oob,
            )
        ],
        "id_col string, vec_col string, n_centroids int, iters int, "
        "train_modulus int, source_table string, synced_version long, "
        "source_ref string, source_ref_id string, oob_appends boolean",
    )
    from pyairbyte_spark.operators.search import _diff_change_counts

    n_removed, n_added = _diff_change_counts(ctx.diff)
    return {
        "watermark": (
            tombstones.unionByName(new_rows),
            f"{index_name}_lists",
        ),
        "replaces": [(meta, f"{index_name}_meta")],
        "docs_changed": n_removed + n_added,
    }


def sync_ivf_index(
    store, index_name: str, *, diff_cache: dict | None = None
) -> dict:
    """Catch the IVF index up to its source table's CURRENT snapshot —
    one ``search._sync_derived_index`` run with the IVF family's row
    derivation (:func:`_ivf_sync_plan`): lists + cursor (meta) move as
    ONE txn group under the watermark CAS; unsafe collapse windows
    rebuild (``attach_ivf_index`` resets the cursor and retrains).
    Returns ``{"synced_from", "synced_to", "docs_changed"}`` (plus
    ``raced`` / ``rebuilt`` on those paths)."""
    from pyairbyte_spark.operators.search import (
        _SyncSpec,
        _sync_derived_index,
    )

    return _sync_derived_index(
        store,
        index_name,
        _SyncSpec(
            label="ivf index",
            attach_name="attach_ivf_index",
            read_meta=_ivf_index_meta,
            payload_cols=lambda m: [m["vec_col"]],
            rebuild=_ivf_rebuild,
            build_plan=_ivf_sync_plan,
        ),
        diff_cache=diff_cache,
    )


def fold_ivf_index(
    store, index_name: str, *, target_files: int | None = None
) -> dict:
    """Fold tombstone debt in the IVF index: rewrite the lists table
    as its NET state (each live (cid, id)'s newest positive row) and
    recluster on cid. Same contention posture as the text/MinHash
    folds: the net frame is computed ONCE and materialized, a lost
    guarded commit catches up with only the rows appended since
    (O(delta)), and non-append interleavers force a recompute. Run
    when :func:`ivf_index_debt` reports debt."""
    from pyairbyte_spark.operators.search import (
        _appends_since,
        _fold_changes,
        _guarded_index_replace,
    )

    ltbl = f"{index_name}_lists"

    def _net(frame: DataFrame) -> DataFrame:
        net = Window.partitionBy("cid", "id")
        newest = Window.partitionBy("cid", "id").orderBy(F.desc("seq"))
        return (
            frame.withColumn("__s", F.sum("sign").over(net))
            .filter((F.col("__s") > 0) & (F.col("sign") > 0))
            .withColumn("__rn", F.row_number().over(newest))
            .filter(F.col("__rn") == 1)
            .select(
                "cid", "id", "v", F.lit(1).cast("long").alias("sign"), "seq"
            )
            .localCheckpoint()
        )

    v0 = store.latest_version(ltbl)
    folded = _net(store.read(ltbl))
    for _ in range(4):
        if _guarded_index_replace(store, [(folded, ltbl, v0)]):
            store.compact(ltbl, sort_by=["cid"], target_files=target_files)
            # the replace reset the write-time clustering property
            store.set_cluster_by(ltbl, ["cid"])
            return {"folded": True, **ivf_index_debt(store, index_name)}
        head = _appends_since(store, ltbl, v0)
        if head is None:  # replace/compact interleaved: start over
            v0 = store.latest_version(ltbl)
            folded = _net(store.read(ltbl))
        elif head > v0:  # appends only: O(delta) catch-up
            folded = _net(
                folded.unionByName(_fold_changes(store, ltbl, v0, head))
            )
            v0 = head
    return {"folded": False}


def gram_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    *,
    int_scale: int | None = None,
) -> DataFrame:
    """Distributed Gram matrix ``X^T X`` over an embedding column —
    the reduction behind corpus covariance / PCA whitening / ZCA of a
    100 TB embedding table. Returns the upper triangle as ``(i, j,
    dot)`` rows (``i <= j``, 0-indexed).

    Execution shape: each partition computes a d×d GEMM partial with
    ONE C-level numpy matmul per Arrow batch (no per-row Python), and
    emits d(d+1)/2 partial rows; a single tiny shuffle sums partials
    by (i, j). Nothing row-scaled ever crosses the network — for
    d=64 that is 2,080 rows per partition regardless of corpus size,
    so the reduction is bandwidth-free and embarrassingly parallel
    (the classic map-side-combine matrix reduction; at a billion rows
    the scan dominates and the merge is noise).

    ``int_scale`` quantizes components to ``round(x * int_scale)``
    JVM-side (Spark ROUND — half away from zero, matching DuckDB's)
    and accumulates in int64: EXACT, summation-order-independent
    arithmetic, which is how the oracle pins the result. Without it,
    partials accumulate in float64 — the production path (any
    distributed float reduction is order-dependent in the last bits).
    """
    import pandas as pd

    v = as_double_vec(vec_col)
    if int_scale is not None:
        v = F.transform(v, lambda x: F.round(x * int_scale).cast("long"))
        schema, np_dtype = "i int, j int, dot long", "int64"
    else:
        schema, np_dtype = "i int, j int, dot double", "float64"

    def partials(batches):
        import numpy as np

        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(r, dtype=np_dtype) for r in pdf["v"]]
            )
            g = x.T @ x
            acc = g if acc is None else acc + g
        if acc is not None:
            iu = np.triu_indices(acc.shape[0])
            yield pd.DataFrame(
                {"i": iu[0], "j": iu[1], "dot": acc[iu[0], iu[1]]}
            )

    return (
        df.select(v.alias("v"))
        .mapInPandas(partials, schema)
        .groupBy("i", "j")
        .agg(F.sum("dot").alias("dot"))
    )


def pca_project(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    *,
    center: bool = True,
) -> tuple[DataFrame, dict]:
    """PCA over the embedding corpus, the 100 TB way: the d×d
    covariance is reduced distributedly (:func:`gram_matrix` — one
    scan, nothing row-scaled shuffles), the eigendecomposition runs on
    the DRIVER (d×d is tiny — 64×64 here; this is how Spark MLlib's
    own PCA works for d ≤ 65535), and the top-k components ship back
    as plan literals for a MAP-ONLY projection (``aggregate`` folds,
    no UDF, no second shuffle).

    Returns ``(projected_df, model)`` where ``projected_df`` carries a
    ``pca`` array<double> column of length k and ``model`` has
    ``mean``, ``components`` (k×d, rows orthonormal), and
    ``explained_variance_ratio``. Component SIGN is fixed by making
    each row's largest-magnitude coordinate positive (eigenvector sign
    is otherwise arbitrary — determinism matters for tests and
    resumable pipelines).
    """
    import numpy as np

    d_row = df.select(
        F.size(as_double_vec(vec_col)).alias("d")
    ).first()
    dim = int(d_row["d"])
    if not 1 <= k <= dim:
        raise ValueError(f"k must be in [1, {dim}], got {k}")
    # One pass for the Gram partials; mean from the same scan shape
    # (sums fold per partition too — aggregate of array slots).
    n = df.count()
    gram_rows = gram_matrix(df, vec_col).collect()
    g = np.zeros((dim, dim))
    for r in gram_rows:
        g[r["i"], r["j"]] = g[r["j"], r["i"]] = r["dot"]
    if center:
        sums = (
            df.select(F.posexplode(as_double_vec(vec_col)).alias("i", "x"))
            .groupBy("i")
            .agg(F.sum("x").alias("s"))
            .collect()
        )
        mean = np.zeros(dim)
        for r in sums:
            mean[r["i"]] = r["s"] / n
        cov = g / n - np.outer(mean, mean)
    else:
        mean = np.zeros(dim)
        cov = g / n
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k×d
    top = evals[order]
    # Deterministic sign: largest-|coordinate| positive per component.
    for c in comps:
        j = int(np.argmax(np.abs(c)))
        if c[j] < 0:
            c *= -1
    total_var = float(np.trace(cov)) or 1.0
    model = {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_variance_ratio": [float(v) / total_var for v in top],
    }
    centered = F.zip_with(
        as_double_vec(vec_col),
        F.array(*[F.lit(float(m)) for m in mean]),
        lambda x, m: x - m,
    )
    proj = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    centered,
                    F.array(*[F.lit(float(w)) for w in comp]),
                    lambda x, w: x * w,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for comp in model["components"]
        ]
    )
    return df.withColumn("pca", proj), model


# -- Product quantization (PQ): compressed ANN for corpora whose raw
# vectors don't fit the cluster's memory/IO budget. d-dim float32
# vectors (256 B at d=64) compress to m one-byte codes (8 B at m=8,
# a 32× cut): split each vector into m subvectors, k-means each
# subspace to ksub codewords, store argmin codes. Queries score
# against RECONSTRUCTIONS via ADC (asymmetric distance computation):
# one ksub×m lookup table per query, then per-row score = table
# gather-sum — numpy `take` + sum over the codes matrix, no float
# vectors ever re-read. This is the FAISS IVFPQ design re-expressed
# as DataFrame ops + Arrow-batched numpy.


def pq_train(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    train_modulus: int = 1,
) -> list[list[list[float]]]:
    """Train PQ codebooks: the vector splits into ``m`` equal
    subvectors; each subspace runs the SAME deterministic sampled
    Lloyd as the IVF coarse quantizer (:func:`kmeans_centroids`) on
    the sliced column. Cost: m small k-means over the 1/train_modulus
    sample — m driver-coordinated loops of declarative plans, the
    iterative-algorithm pattern. Returns ``codebooks[m][ksub][dsub]``
    (a few KB — rides in closures from then on)."""
    from concurrent.futures import ThreadPoolExecutor

    dim = len(corpus.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m

    def train_one(j: int) -> list[list[float]]:
        sub = corpus.select(
            F.col(id_col).alias(id_col),
            F.slice(as_double_vec(vec_col), j * dsub + 1, dsub).alias("sub"),
        )
        cent = kmeans_centroids(
            sub,
            id_col=id_col,
            vec_col="sub",
            n_centroids=ksub,
            iters=iters,
            train_modulus=train_modulus,
        )
        cents = getattr(cent, "_sg_local_rows", None) or cent.collect()
        # order by cid for determinism; pad if a codeword emptied out
        cvs = [list(r["cv"]) for r in sorted(cents, key=lambda r: r["cid"])]
        while len(cvs) < ksub:
            cvs.append(list(cvs[0]))
        return cvs[:ksub]

    # The m subspace trainings are INDEPENDENT Spark job chains —
    # submit them from concurrent driver threads so the cluster
    # overlaps their stages (identical results; each chain is its own
    # deterministic sampled-Lloyd). Wall drops from sum-of-chains to
    # roughly the longest chain.
    with ThreadPoolExecutor(max_workers=m) as pool:
        return list(pool.map(train_one, range(m)))


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector to its ``m`` nearest-codeword codes plus
    the reconstruction's L2 norm (needed once, at encode time, so
    cosine scoring later never touches the raw vectors). One
    Arrow-batched pass: per batch, m small GEMMs (||x_sub − cb||² via
    the expansion trick) — no per-row Python. Returns
    ``(id, code array<int>, recon_norm double)``."""
    import numpy as np
    import pandas as pd

    cb = [np.asarray(b, dtype="float64") for b in codebooks]
    m = len(cb)
    dsub = cb[0].shape[1]

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(r, dtype="float64") for r in pdf["v"]]
            )
            codes = np.empty((len(x), m), dtype="int32")
            norm_sq = np.zeros(len(x))
            for j in range(m):
                xs = x[:, j * dsub : (j + 1) * dsub]
                b = cb[j]
                d2 = (
                    (xs * xs).sum(1)[:, None]
                    - 2.0 * (xs @ b.T)
                    + (b * b).sum(1)[None, :]
                )
                codes[:, j] = np.argmin(d2, axis=1)
                norm_sq += (b[codes[:, j]] * b[codes[:, j]]).sum(1)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "code": list(codes),
                    "recon_norm": np.sqrt(norm_sq),
                }
            )

    src = corpus.select(
        F.col(id_col).alias("id"), as_double_vec(vec_col).alias("v")
    )
    return src.mapInPandas(
        encode, "id long, code array<int>, recon_norm double"
    )


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """ADC top-k over a PQ-encoded corpus: per query, an m×ksub inner-
    product lookup table (q_sub · codeword); per code row, the score is
    a table gather-sum — numpy ``take`` over the codes matrix, the raw
    corpus is never read. Cosine uses the encode-time reconstruction
    norm. Each partition emits only its LOCAL top-k per query (heap
    semantics via argpartition), so the final shuffle carries
    O(partitions × queries × k) rows — corpus-size-free. Output:
    (query_id, neighbor_id, cosine, rank), rank 1..k, ties broken by
    neighbor_id like the exact operators."""
    import numpy as np
    import pandas as pd

    cb = [np.asarray(b, dtype="float64") for b in codebooks]
    m = len(cb)
    dsub = cb[0].shape[1]
    q_rows = queries.select(
        F.col(id_col).alias("qid"), as_double_vec(vec_col).alias("qv")
    ).collect()
    qids = np.asarray([r["qid"] for r in q_rows])
    qmat = np.asarray([list(r["qv"]) for r in q_rows], dtype="float64")
    qnorm = np.sqrt((qmat * qmat).sum(1))
    # luts[q][j][c] = <q_sub_j, codebook_j[c]>
    luts = np.stack(
        [qmat[:, j * dsub : (j + 1) * dsub] @ cb[j].T for j in range(m)],
        axis=1,
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes_m = np.asarray(
                [np.asarray(c) for c in pdf["code"]], dtype="int64"
            )
            ids = pdf["id"].values
            rnorm = pdf["recon_norm"].values
            out_q, out_n, out_s = [], [], []
            for qi in range(len(qids)):
                dots = np.zeros(len(codes_m))
                for j in range(m):
                    dots += luts[qi, j].take(codes_m[:, j])
                denom = qnorm[qi] * np.where(rnorm == 0, 1.0, rnorm)
                cos = dots / denom
                cos[ids == qids[qi]] = -np.inf  # self-match excluded
                top = min(k, len(cos))
                part = np.argpartition(-cos, top - 1)[:top]
                out_q.extend([qids[qi]] * top)
                out_n.extend(ids[part])
                out_s.extend(cos[part])
            yield pd.DataFrame(
                {
                    "query_id": out_q,
                    "neighbor_id": out_n,
                    "cosine": out_s,
                }
            )

    scored = codes.mapInPandas(
        score, "query_id long, neighbor_id long, cosine double"
    ).filter(F.col("cosine") != F.lit(float("-inf")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
    )


# -- Integer-lattice PQ: the oracle-exact / persisted-index variant ---------
# The float PQ above (pq_train/pq_encode/pq_topk) is the trainable
# library path, pinned against numpy. The functions below run PQ on an
# INTEGER lattice (vectors quantized JVM-side to round(x*scale) int64,
# codebooks integer literals/tables), which makes encode + ADC exact
# BIGINT arithmetic — order-independent, bit-identical between Spark
# and a SQL oracle, and the basis of the PERSISTED index lifecycle
# (build_pq_index / append_to_pq_index / pq_index_topk) that amortizes
# training the way build_ivf_index does for IVF.


def quantize_lattice(col: Column | str, int_scale: int = 1000) -> Column:
    """``round(x * int_scale)`` per component, JVM-side — Spark ROUND
    (half away from zero) matches DuckDB's, so both engines land on
    the same int64 lattice. The one quantization every integer-exact
    vector op in this module shares."""
    return F.transform(
        as_double_vec(col), lambda x: F.round(x * int_scale).cast("long")
    )


def pq_encode_int(
    corpus: DataFrame,
    codebooks: list[list[list[int]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    int_scale: int = 1000,
) -> DataFrame:
    """Encode on the integer lattice: quantize JVM-side (bit-matching
    the oracle), then per batch one numpy int64 distance matrix per
    subspace — argmin ties break to the LOWEST code index, same as the
    oracle's ``ORDER BY d2, c``. EXACT: no float enters the encode.
    Returns ``(id, code array<int>, rn2, err2, xn2)`` — all integers:
    ``rn2`` is the reconstruction's squared L2 norm (computed once
    here so query-time cosine never touches the raw vectors), and
    ``err2``/``xn2`` are the squared quantization error and input
    norm — the DRIFT SIGNAL :func:`index_health` reads (err2/xn2 is
    the relative reconstruction error; it rides the encode for free
    because the distance matrix is already in hand)."""
    import numpy as np
    import pandas as pd

    cb = [np.asarray(b, dtype=np.int64) for b in codebooks]
    m = len(cb)
    dsub = cb[0].shape[1]

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(r, dtype=np.int64) for r in pdf["q"]]
            )
            codes = np.empty((len(x), m), dtype=np.int32)
            rn2 = np.zeros(len(x), dtype=np.int64)
            err2 = np.zeros(len(x), dtype=np.int64)
            rows = np.arange(len(x))
            for j in range(m):
                xs = x[:, j * dsub : (j + 1) * dsub]
                b = cb[j]
                d2 = (
                    (xs * xs).sum(1)[:, None]
                    - 2 * (xs @ b.T)
                    + (b * b).sum(1)[None, :]
                )
                codes[:, j] = np.argmin(d2, axis=1)  # first min = lowest c
                rn2 += (b[codes[:, j]] * b[codes[:, j]]).sum(1)
                err2 += d2[rows, codes[:, j]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "code": list(codes),
                    "rn2": rn2,
                    "err2": err2,
                    "xn2": (x * x).sum(1),
                }
            )

    src = corpus.select(
        F.col(id_col).alias("id"),
        quantize_lattice(vec_col, int_scale).alias("q"),
    )
    return src.mapInPandas(
        encode, "id long, code array<int>, rn2 long, err2 long, xn2 long"
    )


def pq_topk_int(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[int]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    int_scale: int = 1000,
) -> DataFrame:
    """ADC top-k over integer-lattice codes: per query an m×ksub
    int64 lookup table; per code row the dot product is a LUT
    gather-sum — exact BIGINT, so the final cosine
    ``round(dots / sqrt(double(qn2 * rn2)), 6)`` is the same double in
    Spark, numpy, and the SQL oracle (exact-integer inputs, one fixed
    op order). Each partition keeps its local top-k per query with a
    2e-6 cosine margin — candidates that could reorder under the
    6-decimal output rounding survive to the global window, so the
    shuffle stays O(partitions × queries × k) without sacrificing
    tie-exactness. Output: (query_id, neighbor_id, cosine, rank)."""
    import numpy as np
    import pandas as pd

    cb = [np.asarray(b, dtype=np.int64) for b in codebooks]
    m = len(cb)
    dsub = cb[0].shape[1]
    q_rows = queries.select(
        F.col(id_col).alias("qid"),
        quantize_lattice(vec_col, int_scale).alias("qv"),
    ).collect()
    qids = np.asarray([r["qid"] for r in q_rows], dtype=np.int64)
    qmat = np.asarray([list(r["qv"]) for r in q_rows], dtype=np.int64)
    qn2 = (qmat * qmat).sum(1)
    luts = np.stack(
        [qmat[:, j * dsub : (j + 1) * dsub] @ cb[j].T for j in range(m)],
        axis=1,
    )  # int64 [n_queries, m, ksub]

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes_m = np.asarray(
                [np.asarray(c) for c in pdf["code"]], dtype=np.int64
            )
            ids = pdf["id"].values.astype(np.int64)
            rn2 = pdf["rn2"].values.astype(np.int64)
            out = []
            for qi in range(len(qids)):
                dots = np.zeros(len(codes_m), dtype=np.int64)
                for j in range(m):
                    dots += luts[qi, j].take(codes_m[:, j])
                keep = ids != qids[qi]
                if not keep.any():
                    continue
                d, i, r = dots[keep], ids[keep], rn2[keep]
                cos = d / np.sqrt((qn2[qi] * r).astype(np.float64))
                if len(cos) > k:
                    kth = np.partition(cos, -k)[-k]
                    sel = cos >= kth - 2e-6  # rounding-reorder margin
                    d, i, r = d[sel], i[sel], r[sel]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qids[qi],
                            "neighbor_id": i,
                            "dots": d,
                            "qn2": qn2[qi],
                            "rn2": r,
                        }
                    )
                )
            if out:
                yield pd.concat(out)

    # qn2 rides the candidate rows from the closure (it is per-query
    # constant) so the final cosine is a pure projection — no join.
    # The DIVISION happens JVM-side in the exact operand order the
    # SQL oracle uses; the ints are the only things Python computed.
    cand = codes.mapInPandas(
        score,
        "query_id long, neighbor_id long, dots long, qn2 long, rn2 long",
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(
            F.col("dots").cast("double")
            / F.sqrt((F.col("qn2") * F.col("rn2")).cast("double")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn(
            "rank", F.row_number().over(w).cast("long")
        )
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def build_pq_index(
    corpus: DataFrame,
    store,
    index_name: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    train_modulus: int = 1,
    int_scale: int = 1000,
    codebooks: list[list[list[int]]] | None = None,
    source_table: str | None = None,
    synced_version: int | None = None,
    source_ref: str | None = None,
    source_ref_id: str | None = None,
) -> dict:
    """Materialize a PQ index INTO a :class:`CommitLogTableStore` —
    the training-amortization answer to :func:`pq_topk`'s query-time
    cost, mirroring :func:`build_ivf_index`: train once per corpus
    refresh, then every :func:`pq_index_topk` probe is a scan of the
    8-byte codes, never the raw vectors.

    Tables: ``<name>_codebooks`` (j, c, cv array<long>, int_scale) and
    ``<name>_codes`` (id, code array<int>, rn2). Training runs the
    same deterministic sampled Lloyd as the float path but on the
    quantized lattice, and codewords round back onto it — so encode
    and ADC stay exact integer arithmetic end to end (oracle-checked
    via the registry's ``ann_pq_index_topk``). Passing ``codebooks``
    (pre-trained integer codewords — e.g. from an offline retrain
    cadence) skips the training scan entirely. Returns
    ``{"n_vectors", "m", "ksub"}``."""
    spark = corpus.sparkSession
    if codebooks is not None:
        books_int = [[list(cw) for cw in book] for book in codebooks]
        m, ksub = len(books_int), len(books_int[0])
    else:
        latticed = corpus.select(
            F.col(id_col).alias("id"),
            F.transform(
                quantize_lattice(vec_col, int_scale),
                lambda x: x.cast("double"),
            ).alias("qv"),
        )
        books = pq_train(
            latticed,
            id_col="id",
            vec_col="qv",
            m=m,
            ksub=ksub,
            iters=iters,
            train_modulus=train_modulus,
        )
        books_int = [
            [[int(round(x)) for x in cw] for cw in book] for book in books
        ]
    cb_rows = [
        (j, c, cw, int_scale)
        for j, book in enumerate(books_int)
        for c, cw in enumerate(book)
    ]
    from pyairbyte_spark.writers import LocalRows

    # driver-resident codebook literals: staged without a Spark job
    store.write_replace(
        LocalRows(cb_rows, "j int, c int, cv array<long>, int_scale int"),
        f"{index_name}_codebooks",
    )
    codes = pq_encode_int(
        corpus, books_int, id_col=id_col, vec_col=vec_col,
        int_scale=int_scale,
    ).withColumn("sign", F.lit(1).cast("long")).withColumn(
        "seq", F.lit(0).cast("long")
    )
    store.write_replace(codes, f"{index_name}_codes")
    # driver-resident meta row: staged without a Spark job
    meta = LocalRows(
        [
            (
                id_col,
                vec_col,
                int(int_scale),
                source_table,
                synced_version,
                source_ref,
                source_ref_id,
            )
        ],
        "id_col string, vec_col string, int_scale int, "
        "source_table string, synced_version long, "
        "source_ref string, source_ref_id string",
    )
    store.write_replace(meta, f"{index_name}_meta")
    return {
        "n_vectors": store.table_stats(f"{index_name}_codes")["rows"],
        "m": m,
        "ksub": ksub,
    }


def _read_pq_codebooks(store, index_name: str) -> tuple[list, int]:
    rows = getattr(store, "read_rows_local", lambda t: None)(
        f"{index_name}_codebooks"
    )
    if not rows:
        rows = store.read(f"{index_name}_codebooks").collect()
    scale = int(rows[0]["int_scale"])
    books: dict[int, dict[int, list[int]]] = {}
    for r in rows:
        books.setdefault(r["j"], {})[r["c"]] = [int(x) for x in r["cv"]]
    out = [
        [books[j][c] for c in sorted(books[j])] for j in sorted(books)
    ]
    return out, scale


def append_to_pq_index(
    new_vectors: DataFrame,
    store,
    index_name: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    txn: tuple[str, int] | None = None,
    allow_oob: bool = False,
) -> dict:
    """Incremental PQ maintenance: encode ``new_vectors`` with the
    EXISTING codebooks and append the codes — O(new vectors), no
    retrain (codebooks drift slowly; rebuild on the retrain cadence).
    ``txn=(app_id, batch_id)`` rides :meth:`write_append`'s
    SetTransaction contract, so a streaming micro-batch appends
    EXACTLY ONCE — this is the hook ``StoreStreamingSink`` uses for
    stream-maintained indexes. Returns ``{"appended", "version",
    "skipped", "quant_err"}``; the appended count AND the batch's
    relative quantization error (the :func:`index_health` drift
    signal) ride one ``observe`` on the encode job itself, so an
    epoch costs exactly ONE job (the staged write) — no separate
    count or error pass.

    ATTACHED indexes (meta records a ``source_table``) refuse
    out-of-band appends unless ``allow_oob=True``, which records
    ``oob_appends`` in the meta BEFORE the data append (flag-first is
    fail-safe) and switches every later :func:`sync_pq_index` to exact
    netted index-side retraction derivation — see
    ``search._guard_oob_append``."""
    from pyspark.sql import Observation

    from pyairbyte_spark.operators.search import _guard_oob_append

    flag = _guard_oob_append(
        store,
        index_name,
        _pq_index_meta(store, index_name),
        allow_oob,
        label="pq index",
        sync_fn="sync_pq_index",
    )
    if flag is not None:
        store.write_replace(flag, f"{index_name}_meta")
    books, scale = _read_pq_codebooks(store, index_name)
    obs = Observation()
    codes = pq_encode_int(
        new_vectors, books, id_col=id_col, vec_col=vec_col, int_scale=scale
    ).observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum("err2").alias("e"),
        F.sum("xn2").alias("x"),
    )
    if "sign" in store.table_columns(f"{index_name}_codes"):
        # metadata-only column check: the epoch stays ONE job
        codes = codes.withColumn("sign", F.lit(1).cast("long")).withColumn(
            "seq", F.lit(0).cast("long")
        )
    res = store.write_append(codes, f"{index_name}_codes", txn=txn)
    skipped = bool((res or {}).get("skipped"))
    # Observation.get is a PROPERTY returning the metrics dict (hence
    # the subscript, not a call). It is populated by the FIRST action
    # on the observed plan — which write_append guarantees is its
    # staged write (see its docstring contract).
    metrics = None if skipped else obs.get
    return {
        # When the txn watermark skips the epoch, the staged write
        # never ran — the observation is empty, and reading it would
        # block. 0 is definitionally right there.
        "appended": 0 if skipped else int(metrics["n"] or 0),
        "version": (res or {}).get(
            "version", store.latest_version(f"{index_name}_codes")
        ),
        "skipped": skipped,
        "quant_err": (
            None
            if skipped or not metrics or not metrics["x"]
            else float(metrics["e"]) / float(metrics["x"])
        ),
    }


def _pq_index_meta(store, index_name: str) -> dict:
    # 1-row protocol table: the driver-local read answers without a
    # Spark job; any precondition miss falls back to the full read.
    rows = getattr(store, "read_rows_local", lambda t: None)(
        f"{index_name}_meta"
    )
    if rows:
        return rows[0]
    return store.read(f"{index_name}_meta").collect()[0].asDict()


def _codes_have_tombstones(store, index_name: str) -> bool:
    """True unless the codes manifest's zone maps PROVE min(sign) >= 0
    over every live file — one O(manifest) metadata read. The proof
    requires every live file to carry a sign stat (statted-file count
    == file count)."""
    st = store.table_stats(f"{index_name}_codes")
    sign = (st.get("columns") or {}).get("sign")
    return not (
        sign is not None
        and sign.get("min") is not None
        and sign["min"] >= 0
        and st.get("files") is not None
        and sign.get("files") == st["files"]
    )


def pq_index_debt(store, index_name: str) -> dict:
    """Tombstone debt of a sync-maintained PQ index (the
    :func:`ivf_index_debt` twin): metadata-only when provably clean."""
    if "sign" not in store.table_columns(f"{index_name}_codes"):
        # pre-r12 index: no tombstone machinery at all
        st = store.table_stats(f"{index_name}_codes")
        return {"rows": st.get("rows"), "tombstone_fraction": 0.0}
    if not _codes_have_tombstones(store, index_name):
        st = store.table_stats(f"{index_name}_codes")
        return {"rows": st.get("rows"), "tombstone_fraction": 0.0}
    g = (
        store.read(f"{index_name}_codes")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum((F.col("sign") < 0).cast("long")).alias("neg"),
        )
        .collect()[0]
    )
    rows = int(g["rows"] or 0)
    debt = (2.0 * int(g["neg"] or 0) / rows) if rows else 0.0
    return {"rows": rows, "tombstone_fraction": debt}


def attach_pq_index(
    store,
    table_name: str,
    index_name: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    train_modulus: int = 1,
    int_scale: int = 1000,
    codebooks: "list[list[list[int]]] | None" = None,
    ref: str | None = None,
) -> dict:
    """Build the PQ index FROM a store table and record the snapshot
    version it covers — :func:`sync_pq_index` then maintains it from
    the table's change feed. ``codebooks`` (pre-trained, e.g. an
    offline retrain cadence) skips the training scan. ``ref`` attaches
    to a BRANCH (write-audit-publish). Index tables live on main."""
    if getattr(store, "_branch", None) is not None:
        raise ValueError(
            "attach from the MAIN view (pass ref=... to follow a "
            "branch); index tables live on main"
        )
    ref_id = None
    src = store
    if ref is not None:
        src = store.branch(ref)
        ref_id = src._branch_info(table_name)["id"]
    v = src.latest_version(table_name)
    return build_pq_index(
        src.read_version(table_name, v),
        store,
        index_name,
        id_col=id_col,
        vec_col=vec_col,
        m=m,
        ksub=ksub,
        iters=iters,
        train_modulus=train_modulus,
        int_scale=int_scale,
        codebooks=codebooks,
        source_table=table_name,
        synced_version=v,
        source_ref=ref,
        source_ref_id=ref_id,
    )


def _pq_rebuild(store, table, index_name, m, ref):
    # rebuild with the SAME frozen codebooks (retrains are explicit)
    books, scale = _read_pq_codebooks(store, index_name)
    attach_pq_index(
        store,
        table,
        index_name,
        id_col=m["id_col"],
        vec_col=m["vec_col"],
        int_scale=scale,
        codebooks=books,
        ref=ref,
    )


def _pq_sync_plan(ctx) -> dict:
    """PQ-family row derivation for ``search._sync_derived_index``:
    retraction tombstones are the removed vectors from the old
    snapshot re-encoded with the FROZEN codebooks and negated (netted
    sum(sign) per id on the fallback, covering out-of-band duplicate
    appends); inserts/updates append codes stamped ``seq = head``.
    ``index_health(kind="pq")`` remains the retrain trigger."""
    m, index_name, head = ctx.m, ctx.index_name, ctx.head
    id_col, vec_col = m["id_col"], m["vec_col"]
    books, scale = _read_pq_codebooks(ctx.store, index_name)

    def _encode(frame, sign):
        return pq_encode_int(
            frame, books, id_col=id_col, vec_col=vec_col, int_scale=scale
        ).withColumn("sign", F.lit(int(sign)).cast("long")).withColumn(
            "seq", F.lit(int(head)).cast("long")
        )

    if ctx.old_removed is not None:
        tombstones = _encode(ctx.old_removed, -1)
    else:
        tombstones = (
            ctx.store.read(f"{index_name}_codes")
            .join(ctx.removed, "id", "left_semi")
            .groupBy("id")
            .agg(
                F.sum("sign").alias("__s"),
                F.first("code").alias("code"),
                F.first("rn2").alias("rn2"),
                F.first("err2").alias("err2"),
                F.first("xn2").alias("xn2"),
            )
            .filter(F.col("__s") > 0)
            .select(
                "id",
                "code",
                "rn2",
                "err2",
                "xn2",
                (-F.col("__s")).cast("long").alias("sign"),
                F.lit(int(head)).cast("long").alias("seq"),
            )
        )
    new_rows = _encode(
        ctx.added.select(F.col(id_col).alias(id_col), F.col(vec_col)), 1
    )
    from pyairbyte_spark.writers import LocalRows

    # driver-resident meta row: staged without a Spark job
    meta = LocalRows(
        [
            (
                id_col,
                vec_col,
                int(scale),
                ctx.table,
                head,
                ctx.ref,
                ctx.ref_id,
                ctx.oob,
            )
        ],
        "id_col string, vec_col string, int_scale int, "
        "source_table string, synced_version long, "
        "source_ref string, source_ref_id string, oob_appends boolean",
    )
    from pyairbyte_spark.operators.search import _diff_change_counts

    n_removed, n_added = _diff_change_counts(ctx.diff)
    return {
        "watermark": (
            tombstones.unionByName(new_rows),
            f"{index_name}_codes",
        ),
        "replaces": [(meta, f"{index_name}_meta")],
        "docs_changed": n_removed + n_added,
    }


def sync_pq_index(
    store, index_name: str, *, diff_cache: dict | None = None
) -> dict:
    """Catch the PQ index up to its source table's CURRENT snapshot —
    one ``search._sync_derived_index`` run with the PQ family's row
    derivation (:func:`_pq_sync_plan`): codes + cursor (meta) move as
    ONE txn group under the watermark CAS; unsafe collapse windows
    rebuild with the SAME frozen codebooks (retrains are explicit).
    Returns ``{"synced_from", "synced_to", "docs_changed"}`` (plus
    ``raced`` / ``rebuilt`` on those paths)."""
    from pyairbyte_spark.operators.search import (
        _SyncSpec,
        _sync_derived_index,
    )

    return _sync_derived_index(
        store,
        index_name,
        _SyncSpec(
            label="pq index",
            attach_name="attach_pq_index",
            read_meta=_pq_index_meta,
            payload_cols=lambda m: [m["vec_col"]],
            rebuild=_pq_rebuild,
            build_plan=_pq_sync_plan,
        ),
        diff_cache=diff_cache,
    )


def fold_pq_index(store, index_name: str) -> dict:
    """Fold tombstone debt in the PQ index: rewrite the codes table as
    its NET state (each live id's newest positive row). Same contention
    posture as the other folds (net computed once, O(delta) catch-up on
    lost races, guarded replace)."""
    from pyairbyte_spark.operators.search import (
        _appends_since,
        _fold_changes,
        _guarded_index_replace,
    )

    ctbl = f"{index_name}_codes"

    def _net(frame: DataFrame) -> DataFrame:
        net = Window.partitionBy("id")
        newest = Window.partitionBy("id").orderBy(F.desc("seq"))
        return (
            frame.withColumn("__s", F.sum("sign").over(net))
            .filter((F.col("__s") > 0) & (F.col("sign") > 0))
            .withColumn("__rn", F.row_number().over(newest))
            .filter(F.col("__rn") == 1)
            .select(
                "id",
                "code",
                "rn2",
                "err2",
                "xn2",
                F.lit(1).cast("long").alias("sign"),
                "seq",
            )
            .localCheckpoint()
        )

    v0 = store.latest_version(ctbl)
    folded = _net(store.read(ctbl))
    for _ in range(4):
        if _guarded_index_replace(store, [(folded, ctbl, v0)]):
            return {"folded": True, **pq_index_debt(store, index_name)}
        head = _appends_since(store, ctbl, v0)
        if head is None:  # replace/compact interleaved: start over
            v0 = store.latest_version(ctbl)
            folded = _net(store.read(ctbl))
        elif head > v0:  # appends only: O(delta) catch-up
            folded = _net(
                folded.unionByName(_fold_changes(store, ctbl, v0, head))
            )
            v0 = head
    return {"folded": False}


def _net_live_rows(df: DataFrame, keys: "list[str]") -> DataFrame:
    """LIVE rows of a sign-tombstone frame: keys whose signs net
    positive, each represented by its newest positive row. The drift
    aggregate in :func:`index_health` must run over THIS, not a bare
    ``sign > 0`` filter — after heavy delete/update syncs the retracted
    rows' original +1 rows (deleted vectors, updated vectors' stale
    rows) would otherwise keep counting until a fold runs (advisor
    r12). No-op on frames without the tombstone machinery."""
    if "sign" not in df.columns:
        return df
    keys = [k for k in keys if k in df.columns]
    net = Window.partitionBy(*keys)
    newest = Window.partitionBy(*keys).orderBy(F.desc("seq"))
    return (
        df.withColumn("__s", F.sum("sign").over(net))
        .filter((F.col("__s") > 0) & (F.col("sign") > 0))
        .withColumn("__rn", F.row_number().over(newest))
        .filter(F.col("__rn") == 1)
        .drop("__s", "__rn")
    )


def index_health(
    store,
    index_name: str,
    *,
    kind: str = "pq",
    threshold: float = 1.5,
) -> dict:
    """Retrain trigger for stream-maintained ANN indexes.

    A frozen quantizer (PQ codebooks / IVF centroids) serves a
    DRIFTED vector distribution with rising quantization error and
    falling probe recall — and because appends are O(new) by design
    (:func:`append_to_pq_index` / :func:`append_to_ivf_index`),
    nothing else in the pipeline surfaces the decay. This compares
    the RELATIVE quantization error of rows appended since the last
    (re)build against the build corpus' own error:

    - ``kind="pq"``: reads the integer ``err2``/``xn2`` columns that
      ride every encode (zero extra hot-path work; the same signal
      surfaces per batch as ``quant_err`` in the append result and
      the streaming sink's ``batch_quant_errs``);
    - ``kind="ivf"``: recomputes assignment error
      ``1 − cos(v, centroid[cid])`` from the stored raw vectors.

    The baseline snapshot is the newest FULL-REWRITE commit on the
    codes/lists table (builds publish REPLACE; the IVF build's
    clustering compact also qualifies); appended rows are the change
    feed since it. Returns ``{"baseline_err", "recent_err", "ratio",
    "appended_rows", "retrain"}`` — ``retrain`` trips when
    ``ratio > threshold``, and is None when nothing was appended,
    the baseline is degenerate, or a pre-health PQ index lacks the
    error columns (rebuild once to enable).

    Rebuild cadence: alert on ``retrain`` (or schedule by appended
    volume), re-run :func:`build_pq_index` / :func:`build_ivf_index`
    over the current corpus — the swap is one atomic commit, probes
    never see a half-built index, the streaming sink keeps appending
    between rebuilds, and probe recall recovers
    (``tests/test_store_txn_sink.py``)."""
    if kind not in ("pq", "ivf"):
        raise ValueError(f"kind must be 'pq' or 'ivf', got {kind!r}")
    table = (
        f"{index_name}_codes" if kind == "pq" else f"{index_name}_lists"
    )
    hist = store.history(table)
    v_latest = hist[0]["version"]
    v_build = next(
        (h["version"] for h in hist if h["op"] in ("replace", "compact")),
        hist[-1]["version"],
    )
    base = store.read_version(table, v_build)
    if kind == "pq":
        if "err2" not in base.columns:
            return {
                "baseline_err": None,
                "recent_err": None,
                "ratio": None,
                "appended_rows": 0,
                "retrain": None,  # pre-health index: rebuild to enable
            }

        def rel_err(df):
            df = _net_live_rows(df, ["id"])
            r = df.agg(
                F.sum("err2").alias("e"), F.sum("xn2").alias("x")
            ).collect()[0]
            return (
                None if not r["x"] else float(r["e"]) / float(r["x"])
            )

    else:
        cent = F.broadcast(
            store.read(f"{index_name}_centroids").select("cid", "cv")
        )

        def rel_err(df):
            df = _net_live_rows(df, ["cid", "id"])
            r = (
                df.join(cent, "cid")
                .select(
                    (
                        1
                        - dot_expr(F.col("v"), F.col("cv"))
                        / (
                            norm_expr(F.col("v"))
                            * norm_expr(F.col("cv"))
                        )
                    ).alias("err")
                )
                .agg(F.avg("err").alias("e"))
                .collect()[0]
            )
            return None if r["e"] is None else float(r["e"])

    baseline = rel_err(base)
    appended_rows = 0
    recent = None
    if v_latest > v_build:
        changes = store.read_changes(table, v_build, v_latest).filter(
            F.col("_change_type") == "insert"
        )
        appended_rows = changes.count()
        if appended_rows:
            recent = rel_err(changes)
    ratio = (
        recent / baseline
        if recent is not None and baseline
        else None
    )
    return {
        "baseline_err": baseline,
        "recent_err": recent,
        "ratio": ratio,
        "appended_rows": appended_rows,
        "retrain": None if ratio is None else bool(ratio > threshold),
    }


def pq_index_topk(
    store,
    index_name: str,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Query a :func:`build_pq_index` index: ADC over the persisted
    codes table — the corpus raw vectors are never read, training is
    already paid. Output matches :func:`pq_topk_int` with the same
    codebooks exactly. Sign-tombstone fold (``sync_pq_index`` retracts
    deleted/updated vectors by appending their codes negated): each
    live id's newest positive row scores — skipped entirely when the
    manifest's zone maps prove ``min(sign) >= 0``."""
    books, scale = _read_pq_codebooks(store, index_name)
    codes_df = store.read(f"{index_name}_codes")
    if "sign" in codes_df.columns and _codes_have_tombstones(
        store, index_name
    ):
        net = Window.partitionBy("id")
        newest = Window.partitionBy("id").orderBy(F.desc("seq"))
        codes_df = (
            codes_df.withColumn("__s", F.sum("sign").over(net))
            .filter((F.col("__s") > 0) & (F.col("sign") > 0))
            .withColumn("__rn", F.row_number().over(newest))
            .filter(F.col("__rn") == 1)
        )
    codes = codes_df.select("id", "code", "rn2")
    return pq_topk_int(
        codes,
        queries,
        books,
        id_col=id_col,
        vec_col=vec_col,
        k=k,
        int_scale=scale,
    )
