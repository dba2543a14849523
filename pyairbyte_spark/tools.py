"""Local tool surface (the reference's MCP tools as plain callables).

Mirrors ``airbyte/mcp/local.py`` (S16 and friends): the same tool
functions — stream listing, schema introspection, record previews,
sync, cache inspection, guarded SQL — exposed as ordinary Python
functions over a (source, cache) pair. An MCP host would register
these 1:1; no MCP dependency is required to use or test them.

Reference tool → here:
  list_source_streams           → list_source_streams       (local.py:269)
  get_source_stream_json_schema → get_stream_json_schema    (local.py:336)
  read_source_stream_records    → read_stream_records       (local.py:403)
  get_stream_previews           → get_stream_previews       (local.py:494)
  sync_source_to_cache          → sync_source_to_cache      (local.py:607)
  list_cached_streams           → list_cached_streams       (local.py:717)
  describe_default_cache        → describe_cache            (local.py:739)
  run_sql_query (guarded)       → run_sql_query             (local.py:794)
  validate_connector_config     → validate_source           (local.py:135)
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from pyairbyte_spark.cache import SparkCache
from pyairbyte_spark.sources.base import SparkSource


def validate_source(source: SparkSource) -> dict[str, Any]:
    """`check` the source and report the outcome."""
    try:
        ok = source.check()
        return {"success": bool(ok), "message": "connection check passed" if ok else "check failed"}
    except Exception as exc:  # noqa: BLE001 - tool surface reports, not raises
        return {"success": False, "message": str(exc)}


def list_source_streams(source: SparkSource) -> list[str]:
    return source.get_available_streams()


def get_stream_json_schema(source: SparkSource, stream_name: str) -> dict[str, Any]:
    spec = source.discovered_catalog()[stream_name]
    return spec.json_schema


def read_stream_records(
    source: SparkSource, stream_name: str, *, limit: int = 100
) -> list[dict[str, Any]]:
    return list(source.get_records(stream_name, limit=limit))


def get_stream_previews(
    source: SparkSource, streams: list[str] | None = None, *, limit: int = 5
) -> dict[str, list[dict[str, Any]]]:
    return source.get_samples(streams, limit=limit)


def sync_source_to_cache(
    source: SparkSource,
    cache: SparkCache,
    *,
    streams: list[str] | None = None,
    write_strategy: str = "auto",
) -> dict[str, int]:
    if streams:
        source.select_streams(streams)
    result = source.read(cache, write_strategy=write_strategy)
    return dict(result.record_counts)


def list_cached_streams(cache: SparkCache) -> list[dict[str, Any]]:
    return [
        {"stream_name": name, "table_name": cache.table_name(name)}
        for name in cache.stream_names
    ]


def describe_cache(cache: SparkCache) -> dict[str, Any]:
    return {
        "cache_type": "SparkCache",
        "warehouse_dir": cache.warehouse_dir,
        "schema_name": getattr(cache, "schema_name", "airbyte_raw"),
        "streams": cache.stream_names,
    }


def run_sql_query(
    cache: SparkCache, sql: str, *, max_records: int = 1000
) -> list[dict[str, Any]]:
    """Guarded: single-statement SELECT/DESCRIBE/SHOW/EXPLAIN only
    (raises UnsafeSQLError otherwise — same gate as local.py:753-846)."""
    return cache.run_sql_query(sql, max_records=max_records)


# -- ACID table maintenance (commit-log caches) -------------------------------


def get_table_history(cache: SparkCache, stream_name: str) -> list[dict[str, Any]]:
    """Commit history for one stream's table (newest first)."""
    return cache.table_history(stream_name)


def read_table_changes(
    cache: SparkCache,
    stream_name: str,
    from_version: int,
    to_version: int | None = None,
    *,
    max_records: int = 1000,
) -> list[dict[str, Any]]:
    """Change data feed between two commit versions, capped at
    ``max_records`` rows (driver-safe for tool output)."""
    df = cache.read_stream_changes(stream_name, from_version, to_version)
    return [row.asDict(recursive=True) for row in df.limit(max_records).collect()]


def compact_table(
    cache: SparkCache,
    stream_name: str,
    *,
    sort_by: list[str] | None = None,
    target_files: int | None = None,
) -> dict[str, Any]:
    """OPTIMIZE-style maintenance: collapse append fragmentation,
    optionally clustering on ``sort_by`` for data skipping."""
    return cache.compact(stream_name, sort_by=sort_by, target_files=target_files)


def get_maintenance_plan(
    cache: SparkCache, stream_name: str
) -> list[dict[str, Any]]:
    """Which maintenance actions are worth running on a cached
    stream's table (compact / refresh_bloom / vacuum / resolve), from
    one metadata inspection — the agent-facing table doctor."""
    return cache.maintenance_plan(stream_name)


def get_store_maintenance_plan(cache: SparkCache) -> dict[str, Any]:
    """The WAREHOUSE doctor: one call returning every table's
    maintenance plan, every derived index's debt signals (tombstone
    fold / clustering refresh, from the sync layer's health checks),
    and the txn-group decision-file backlog."""
    return cache.store_maintenance_plan()


def apply_store_maintenance(
    cache: SparkCache, *, dry_run: bool = False
) -> dict[str, Any]:
    """EXECUTE the warehouse doctor's prescriptions: compactions (with
    bloom re-cover folded into the same rewrite), vacuums, index
    tombstone folds and clustering refreshes, and the txn-decision
    vacuum — each action isolated (one failure doesn't stop the rest).
    ``dry_run=true`` reports what WOULD run without touching anything.
    Judgment calls (drop_ref / review_ingest / resolve) are listed as
    skipped, never auto-applied."""
    return cache.apply_maintenance_plan(dry_run=dry_run)


def verify_table(
    cache: SparkCache, stream_name: str, *, deep: bool = False
) -> dict[str, Any]:
    """FSCK a cached stream: audits manifest resolution, data-file
    presence and size drift, DV/bloom sidecars, txn-group decision
    invariants, and orphan dirs — metadata-only, no Spark job."""
    return cache.verify_stream(stream_name, deep=deep)


def aggregate_table_rows(
    cache: SparkCache,
    stream_name: str,
    aggs: list[list[str]],
    predicates: list[list[list[Any]]] | None = None,
) -> dict[str, Any]:
    """Exact filtered aggregates with pushdown into the table
    manifest: a list of [fn, column] pairs (fn: count/sum/min/max/avg;
    column "*" for count). Must-match files answer from footer stats
    without being read — min/max from zone maps, count from row
    counts, sum/avg from store-harvested per-file sums
    (build_table_sum_stats backfills them) — and only boundary files
    scan. Predicates share count_table_rows' DNF shape."""
    preds = (
        [[tuple(p) for p in branch] for branch in predicates]
        if predicates
        else None
    )
    return cache.agg_stream_rows(
        stream_name, [tuple(a) for a in aggs], preds
    )


def build_table_sum_stats(
    cache: SparkCache,
    stream_name: str,
    columns: list[str] | None = None,
) -> dict[str, Any]:
    """Backfill per-file column SUMs into a cached stream's manifest
    stats so sum/avg aggregate pushdowns (aggregate_table_rows) answer
    from metadata with zero file reads. One column-pruned job over
    exactly the files missing a sum, published as a row-preserving
    repair_metadata commit."""
    return cache.build_sum_stats(stream_name, columns)


def rebucket_table(
    cache: SparkCache, stream_name: str, n_buckets: int | None = None
) -> dict[str, Any]:
    """Bucket-layout evolution: rewrite a cached stream's table with a
    new merge-bucket count (omit to un-bucket). One shuffle, rows
    identical; every later merge/append/read uses the new layout."""
    return cache.rebucket_stream(stream_name, n_buckets)


def delete_table_rows(
    cache: SparkCache,
    stream_name: str,
    predicates: list[list],
) -> dict[str, Any]:
    """File-pruned DELETE FROM <stream> WHERE <conjunctive predicates>.
    Predicates are [col, op, value] triples (ops: = < <= > >= in
    is_null not_null). Returns deleted_rows / files_rewritten."""
    return cache.delete_stream_where(
        stream_name, [tuple(p) for p in predicates]
    )


def update_table_rows(
    cache: SparkCache,
    stream_name: str,
    predicates: list[list],
    assignments: dict[str, str],
) -> dict[str, Any]:
    """File-pruned UPDATE <stream> SET <assignments> WHERE <predicates>.
    Assignments map column → SQL expression evaluated against the
    row's PRE-update values."""
    return cache.update_stream_where(
        stream_name, [tuple(p) for p in predicates], dict(assignments)
    )


def rename_table_column(
    cache: SparkCache, stream_name: str, old: str, new: str
) -> dict[str, Any]:
    """Metadata-only column rename (zero data I/O at any size)."""
    return {"version": cache.rename_stream_column(stream_name, old, new)}


def drop_table_column(
    cache: SparkCache, stream_name: str, column: str
) -> dict[str, Any]:
    """Metadata-only column drop (zero data I/O at any size)."""
    return {"version": cache.drop_stream_column(stream_name, column)}


def restore_table(
    cache: SparkCache, stream_name: str, version: int
) -> dict[str, Any]:
    """RESTORE the stream's table to an earlier commit version (a new
    forward commit; metadata-only; requires un-vacuumed data)."""
    return {"version": cache.restore_stream(stream_name, int(version))}


def set_table_check(
    cache: SparkCache, stream_name: str, name: str, expr: str
) -> dict[str, Any]:
    """Persist a CHECK constraint (SQL boolean expr; NULL passes).
    Existing rows are validated first; later writes — including
    UPDATE rewrites — enforce it in-flight."""
    return {"version": cache.set_stream_check(stream_name, name, expr)}


def drop_table_check(
    cache: SparkCache, stream_name: str, name: str
) -> dict[str, Any]:
    """Remove a persisted CHECK constraint."""
    return {"version": cache.drop_stream_check(stream_name, name)}


def get_table_checks(cache: SparkCache, stream_name: str) -> dict[str, str]:
    """The stream's persisted CHECK constraints (name → SQL expr)."""
    return cache.stream_checks(stream_name)


def vacuum_table(
    cache: SparkCache, stream_name: str, *, keep_commits: int = 1
) -> dict[str, Any]:
    """Reclaim data dirs unreferenced by the most recent commits."""
    removed = cache.vacuum(stream_name, keep_commits=keep_commits)
    return {"removed_dirs": removed, "kept_commits": keep_commits}


def analyze_table_ndv(
    cache: SparkCache, stream_name: str, columns: list[str]
) -> dict[str, Any]:
    """ANALYZE: compute + persist approximate-distinct (HLL) stats for
    the given columns in the stream table's stats sidecar."""
    doc = cache.analyze_stream_ndv(stream_name, columns)
    return {"version": doc["version"], "columns": sorted(doc["columns"])}


def get_table_ndv(cache: SparkCache, stream_name: str) -> dict[str, int]:
    """Per-column approximate distinct counts from maintained NDV
    stats (no data scan; auto-catches-up from the change feed)."""
    return cache.stream_approx_distinct(stream_name)


def profile_table(
    cache: SparkCache, stream_name: str, columns: list[str] | None = None
) -> list[dict[str, Any]]:
    """Deequ-style column profile of a cached stream: per-column row/
    null counts, typed min/max, HLL approx-distinct (two passes total
    regardless of column count)."""
    from pyairbyte_spark.operators.stats import profile_columns

    df = cache[stream_name].to_spark()
    cols = columns or [
        c for c in df.columns if not c.startswith("_airbyte_")
    ]
    return [
        r.asDict() for r in profile_columns(df, cols).orderBy("column").collect()
    ]


def clone_table(
    cache: SparkCache, source_stream: str, dest_stream: str
) -> dict[str, Any]:
    """SHALLOW CLONE: zero-copy snapshot of a cached stream as a new
    stream table (references the source's files; diverges
    independently; compact_table materializes)."""
    v = cache.clone_stream(source_stream, dest_stream)
    return {"cloned": dest_stream, "from": source_stream, "version": v}


def vector_search_table(
    cache: SparkCache,
    stream_name: str,
    query_id: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> list[dict[str, Any]]:
    """Cosine top-k similarity search over a cached stream's embedding
    column: the corpus row whose ``id_col`` equals ``query_id`` is the
    query vector; returns its ``k`` nearest neighbors (exact brute
    force — JVM fold dot products, no UDF; for indexed/approximate
    search at corpus scale use ``build_pq_index``/``build_ivf_index``
    programmatically)."""
    from pyairbyte_spark.operators.similarity import brute_force_topk

    df = cache[stream_name].to_spark()
    q = df.filter(F.col(id_col) == query_id)
    out = brute_force_topk(df, q, id_col=id_col, vec_col=vec_col, k=k)
    return [r.asDict() for r in out.orderBy("rank").collect()]


def get_index_health(
    cache: SparkCache, index_name: str, *, kind: str = "pq"
) -> dict[str, Any]:
    """Retrain trigger for a stream-maintained ANN index (built with
    ``build_pq_index``/``build_ivf_index`` against this cache's
    store): relative quantization error of appended vectors vs the
    build corpus — ``retrain`` trips past the drift threshold."""
    from pyairbyte_spark.operators.similarity import index_health

    return index_health(cache.store, index_name, kind=kind)


def find_near_duplicates(
    cache: SparkCache,
    stream_name: str,
    text: str,
    *,
    index_name: str = "mh",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_agree: int = 6,
    include_index_state: bool = False,
) -> "list[dict[str, Any]] | dict[str, Any]":
    """Is this text a near-duplicate of anything already ingested?
    Probes a persisted MinHash-LSH index (``build_minhash_index`` over
    this cache's store) in O(touched buckets); when no index exists,
    falls back to an exact corpus-scale LSH pass over the stream's
    table. Returns matched doc ids with band hits and signature
    agreement (estimated Jaccard = n_agree / num_hashes).
    ``include_index_state=True`` wraps the matches with the probed
    index's coverage watermark (``{"matches", "index"}``) so callers
    see when probe pruning has decayed — see
    :func:`get_dedup_index_health` / :func:`refresh_dedup_index`."""
    from pyairbyte_spark.operators import dedup

    spark = cache.spark
    index_state: dict[str, Any] | None = None
    q = spark.createDataFrame([(-1, text)], f"{id_col} long, {text_col} string")
    try:
        out = dedup.minhash_index_matches(
            cache.store, index_name, q, min_agree=min_agree
        )
        if include_index_state:
            cov = dedup.minhash_index_coverage(cache.store, index_name)
            index_state = {
                k: cov[k]
                for k in ("coverage", "files_total", "files_unclustered")
            }
    except FileNotFoundError:
        docs = cache[stream_name].to_spark().select(id_col, text_col)
        both = docs.unionByName(q)
        pairs = dedup.minhash_lsh_candidates(both, text_col, id_col)
        out = (
            pairs.filter((F.col("id_a") == -1) | (F.col("id_b") == -1))
            .select(
                F.lit(-1).alias("query_id"),
                F.when(F.col("id_a") == -1, F.col("id_b"))
                .otherwise(F.col("id_a"))
                .alias("match_id"),
                "n_bands",
                F.lit(None).cast("long").alias("n_agree"),
            )
        )
    matches = [r.asDict() for r in out.orderBy(F.desc("n_bands")).collect()]
    if include_index_state:
        return {
            "matches": matches,
            "index": index_state
            or {"coverage": None, "note": "no persisted index (full scan)"},
        }
    return matches


def get_consistent_snapshot(
    cache: SparkCache,
    *,
    streams: "list[str] | None" = None,
    chain: "list[list[str]] | None" = None,
    follower_name: str = "feed",
) -> dict[str, Any]:
    """Pin a torn-free version vector across several streams (see
    :meth:`SparkCache.snapshot_streams`): for follower-maintained
    chains pass ``chain=[["raw","clean"],["clean","agg"]]`` — the pin
    reads each hop's provenance watermark so a clean ⋈ agg view never
    mixes a fresh upstream with a stale downstream; for independent
    streams pass ``streams=[...]`` (pinned at capture). Returns the
    vector plus per-stream pinned row counts; read the pinned data
    with ``read_stream_version(stream, versions[stream])`` / SQL over
    it."""
    snap = cache.snapshot_streams(
        streams,
        chain=[tuple(h) for h in chain] if chain else None,
        follower_name=follower_name,
    )
    return {
        "versions": snap.versions,
        "rows": {s: snap.read(s).count() for s in snap.versions},
    }


def get_dedup_index_health(
    cache: SparkCache, *, index_name: str = "mh"
) -> dict[str, Any]:
    """Health signals for the stream's persisted MinHash-LSH dedup
    index — the dedup analogue of the ANN ``get_index_health``:
    unclustered fraction (probe pruning decays with every ingest-time
    append; ``refresh_dedup_index`` repairs) and hot-band skew
    (boilerplate ingest collapses docs into one bucket, degrading
    probe selectivity — a data problem a refresh cannot fix)."""
    from pyairbyte_spark.operators.dedup import minhash_index_health

    return minhash_index_health(cache.store, index_name)


def refresh_dedup_index(
    cache: SparkCache,
    *,
    index_name: str = "mh",
    target_files: int | None = None,
) -> dict[str, Any]:
    """Recluster the dedup index's unclustered append tail (O(tail),
    rows identical, CDF-silent) so probe pruning returns to the
    compacted level; returns the post-refresh coverage watermark."""
    from pyairbyte_spark.operators.dedup import refresh_minhash_index

    out = refresh_minhash_index(
        cache.store, index_name, target_files=target_files
    )
    out.pop("unclustered_entries", None)  # internal paths
    return out


def scan_duplicate_spans(
    cache: SparkCache, stream_name: str, *, n: int = 10, limit: int = 20
) -> list[dict[str, Any]]:
    """ExactSubstr dedup report for a cached stream: the ``limit``
    documents with the largest duplicated-span token counts (Lee et
    al. 2022 removal semantics — positional n-grams, in-doc repeats
    count), with their cleaned text."""
    from pyairbyte_spark.operators.dedup import remove_duplicate_spans

    docs = cache[stream_name].to_spark()
    out = (
        remove_duplicate_spans(docs, n=n)
        .filter(F.col("n_removed") > 0)
        .orderBy(F.desc("n_removed"))
        .limit(limit)
    )
    return [r.asDict() for r in out.collect()]


def get_bloom_coverage(
    cache: SparkCache, stream_name: str
) -> dict[str, Any] | None:
    """Bloom-index coverage watermark for a cached stream: how many
    live files the point-lookup index covers (compactions and COW DML
    decay coverage until an only_missing rebuild; reads stay exact)."""
    return cache.store.bloom_coverage(cache.table_name(stream_name))


def create_table_branch(
    cache: SparkCache, stream_name: str, branch: str
) -> dict[str, Any]:
    """Fork a write-audit-publish branch of a cached stream's table:
    candidate writes land on the branch invisibly, main keeps serving
    the audited state until publish. One tiny ref PUT; no data moves."""
    return cache.create_stream_branch(stream_name, branch)


def publish_table_branch(
    cache: SparkCache,
    stream_name: str,
    branch: str,
    *,
    drop: bool = True,
    mode: str = "ff",
) -> dict[str, Any]:
    """Publish an audited branch: fast-forward main to the branch tip
    with ONE atomic commit (refused if main diverged past the fork;
    mode="rebase-appends" grafts an append-only branch onto an
    advanced main). Returns the published main version."""
    return {
        "published_version": cache.publish_stream_branch(
            stream_name, branch, drop=drop, mode=mode
        )
    }


def drop_table_branch(
    cache: SparkCache, stream_name: str, branch: str
) -> dict[str, Any]:
    """Abandon an audit branch without publishing anything."""
    cache.drop_stream_branch(stream_name, branch)
    return {"dropped": branch}


def list_table_refs(cache: SparkCache, stream_name: str) -> dict[str, Any]:
    """All named refs (write-audit-publish branches + version tags) of
    a cached stream's table, with fork base / pinned version."""
    return cache.stream_refs(stream_name)


def count_table_rows(
    cache: SparkCache,
    stream_name: str,
    predicates: list[list[list[Any]]] | None = None,
) -> dict[str, Any]:
    """Exact filtered row count with aggregate pushdown into the table
    manifest: unfiltered counts touch ZERO data files, clustered-range
    counts read only the boundary files, everything else degrades to a
    zone-map-pruned scan. Predicates are DNF: a list of AND-branches,
    each branch a list of [column, op, value] triples (ops: = < <= > >=
    in is_null not_null)."""
    preds = (
        [[tuple(p) for p in branch] for branch in predicates]
        if predicates
        else None
    )
    return cache.count_stream_rows(stream_name, preds)


def build_search_index(
    cache: SparkCache,
    stream_name: str,
    *,
    index_name: str = "bm25",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, Any]:
    """Materialize a persisted inverted text index over a cached
    stream (token-clustered postings + mergeable corpus stats) so
    keyword searches probe O(touched postings) instead of rescanning
    the corpus. The index is ATTACHED to the stream's table: keep it
    fresh with ``sync_search_index`` after DML (out-of-band appends
    are guarded — they would break the sync's retraction invariant)
    or let an ``IndexSyncFollower`` cadence do it."""
    from pyairbyte_spark.operators import search as s

    return s.attach_text_index(
        cache.store,
        cache.table_name(stream_name),
        index_name,
        id_col=id_col,
        text_col=text_col,
    )


def search_documents(
    cache: SparkCache,
    stream_name: str,
    query: str,
    *,
    k: int = 10,
    index_name: str = "bm25",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[dict[str, Any]]:
    """BM25 keyword search over a cached stream: probes the persisted
    inverted index when one exists (``build_search_index``), else
    falls back to one exact full-scan scoring pass. Returns the top-k
    ``{id, n_hit_terms, bm25}`` rows."""
    from pyairbyte_spark.operators import search as s
    from pyairbyte_spark.operators import text as txt

    terms = [t for t in query.split() if t]
    try:
        out = s.text_index_search(cache.store, index_name, terms, limit=k)
    except FileNotFoundError:
        docs = cache[stream_name].to_spark().select(id_col, text_col)
        out = (
            txt.bm25_scores(docs, terms, id_col=id_col, text_col=text_col)
            .orderBy(F.desc("bm25"), id_col)
            .limit(k)
        )
    return [r.asDict() for r in out.collect()]


def set_table_clustering(
    cache: SparkCache,
    stream_name: str,
    columns: list[str] | None = None,
) -> dict[str, Any]:
    """Set (or clear, by omitting columns) write-time clustering on a
    cached stream's table: every later append range-sorts on the
    cluster keys before staging, keeping range/point scans file-pruned
    through ingest without compaction cycles."""
    v = cache.set_stream_cluster_by(stream_name, columns)
    return {"version": v, "cluster_by": columns or None}


def sync_search_index(
    cache: SparkCache, index_name: str = "bm25"
) -> dict[str, Any]:
    """Catch the inverted text index up to its source table's current
    snapshot from the change feed — deletions/updates retract as
    tombstone postings, inserts append, and the whole step (postings +
    corpus stats + cursor) lands as one atomic transaction."""
    from pyairbyte_spark.operators import search as s

    return s.sync_text_index(cache.store, index_name)


def build_dedup_index(
    cache: SparkCache,
    stream_name: str,
    *,
    index_name: str = "mh",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, Any]:
    """Materialize a persisted MinHash-LSH near-duplicate index over a
    cached stream (band-clustered buckets + signatures), recording the
    snapshot it covers so ``sync_dedup_index`` can maintain it from
    the table's change feed. ``find_near_duplicates`` then probes it
    in O(touched buckets)."""
    from pyairbyte_spark.operators import dedup

    return dedup.attach_minhash_index(
        cache.store,
        cache.table_name(stream_name),
        index_name,
        id_col=id_col,
        text_col=text_col,
    )


def sync_dedup_index(
    cache: SparkCache, index_name: str = "mh"
) -> dict[str, Any]:
    """Catch the near-duplicate index up to its source table's current
    snapshot — deleted documents STOP matching (their band rows
    retract), updated documents re-sign, all in one atomic step."""
    from pyairbyte_spark.operators import dedup

    return dedup.sync_minhash_index(cache.store, index_name)


def build_vector_index(
    cache: SparkCache,
    stream_name: str,
    *,
    index_name: str = "ivf",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
) -> dict[str, Any]:
    """Materialize a persisted IVF vector index over a cached stream
    (frozen coarse quantizer + cid-clustered inverted lists),
    recording the snapshot it covers so ``sync_vector_index`` can
    maintain it from the table's change feed."""
    from pyairbyte_spark.operators import similarity

    return similarity.attach_ivf_index(
        cache.store,
        cache.table_name(stream_name),
        index_name,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_centroids,
    )


def sync_vector_index(
    cache: SparkCache, index_name: str = "ivf"
) -> dict[str, Any]:
    """Catch the IVF vector index up to its source table's current
    snapshot — deleted vectors STOP matching (their list rows retract
    in exactly their quantizer cell), updated vectors re-assign, all
    in one atomic step; the quantizer stays frozen (retrain via
    ``get_index_health``'s drift signal)."""
    from pyairbyte_spark.operators import similarity

    return similarity.sync_ivf_index(cache.store, index_name)


def get_search_index_health(
    cache: SparkCache, index_name: str = "bm25"
) -> dict[str, Any]:
    """Health of the inverted text index: tombstone debt (dead rows
    accumulated by sync retractions, taxing every probe) and stale
    clustering — with the repair verb named in each issue."""
    from pyairbyte_spark.operators import search as s

    return s.text_index_health(cache.store, index_name)


def fold_search_index(
    cache: SparkCache, index_name: str = "bm25"
) -> dict[str, Any]:
    """Fold the text index's tombstone debt: rewrite postings as their
    net state and recluster. Guarded — never clobbers a concurrent
    sync (folded=False means re-run)."""
    from pyairbyte_spark.operators import search as s

    return s.fold_text_index(cache.store, index_name)


def fold_dedup_index(
    cache: SparkCache, index_name: str = "mh"
) -> dict[str, Any]:
    """Fold the near-duplicate index's tombstone debt: net band rows +
    signatures pruned to live docs, then recluster. Guarded against
    concurrent syncs."""
    from pyairbyte_spark.operators import dedup

    return dedup.fold_minhash_index(cache.store, index_name)
