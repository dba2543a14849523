"""MCP server over the local tool surface.

The reference serves its tools over the Model Context Protocol
(``airbyte/mcp/server.py:1-353`` registers them on a FastMCP app;
``airbyte/mcp/local.py`` defines the local tool set). This module is
the same capability without third-party MCP dependencies: a minimal
JSON-RPC 2.0 stdio server speaking the public MCP wire protocol
(``initialize`` → ``tools/list`` → ``tools/call``, newline-delimited
JSON — modelcontextprotocol.io spec), registering the 1:1-mapped tool
functions from :mod:`pyairbyte_spark.tools`.

Design notes:

- Transport and protocol are dependency-free so the server runs in any
  environment the package runs in; if a real ``mcp``/``fastmcp``
  package is present a host can just as well import
  :data:`TOOL_DEFS` and register the same handlers there.
- Tool handlers close over a :class:`LocalToolHost` that lazily builds
  the SparkSession-backed cache on first use — ``tools/list`` and
  source-only tools never pay Spark startup.
- Guarded SQL goes through the same :func:`~pyairbyte_spark.tools.run_sql_query`
  gate as the Python API (single read-only statement).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import IO, Any, Callable

PROTOCOL_VERSION = "2025-06-18"
SERVER_INFO = {"name": "pyairbyte-spark-mcp", "version": "1.0"}


# -- tool host ---------------------------------------------------------------


class LocalToolHost:
    """Session context the tool handlers run against.

    Resolves sources from a ``source`` spec (the CLI's specifier
    grammar: ``faker`` / ``fixture`` / ``benchmark:N`` /
    ``manifest:/path`` / registry name / argv string) plus optional
    ``config``, memoized per (spec, config) so repeated tool calls
    reuse discovery. The cache is created lazily at ``warehouse_dir``.
    """

    def __init__(
        self,
        *,
        warehouse_dir: str | None = None,
        cache: Any = None,
        source_resolver: Callable[[str, dict | None], Any] | None = None,
        cloud_workspace: Any = None,
    ) -> None:
        self._warehouse_dir = warehouse_dir
        self._cache = cache
        self._source_resolver = source_resolver
        self._sources: dict[str, Any] = {}
        self._cloud_workspace = cloud_workspace

    def get_cloud_workspace(self, workspace_id: str | None = None):
        """Workspace for the cloud tools: an injected one (tests,
        embedded hosts) or one built from env credentials
        (``AIRBYTE_CLOUD_WORKSPACE_ID`` + ``AIRBYTE_CLOUD_API_KEY``,
        optional ``AIRBYTE_CLOUD_API_URL``) — the reference's
        ``mcp/cloud.py:246-289`` resolution, minus HTTP-header config."""
        if self._cloud_workspace is not None:
            return self._cloud_workspace
        import os

        from pyairbyte_spark import exceptions as exc
        from pyairbyte_spark.cloud import DEFAULT_API_ROOT, CloudWorkspace, HttpTransport

        ws_id = workspace_id or os.environ.get("AIRBYTE_CLOUD_WORKSPACE_ID")
        token = os.environ.get("AIRBYTE_CLOUD_API_KEY")
        if not ws_id or not token:
            raise exc.PyAirbyteInputError(
                message="Cloud workspace is not configured.",
                context={
                    "guidance": "Set AIRBYTE_CLOUD_WORKSPACE_ID and "
                    "AIRBYTE_CLOUD_API_KEY (optionally AIRBYTE_CLOUD_API_URL)."
                },
            )
        transport = HttpTransport(
            api_root=os.environ.get("AIRBYTE_CLOUD_API_URL", DEFAULT_API_ROOT),
            bearer_token=token,
        )
        self._cloud_workspace = CloudWorkspace(
            workspace_id=ws_id, transport=transport
        )
        return self._cloud_workspace

    @property
    def cache(self):
        if self._cache is None:
            import tempfile

            from pyairbyte_spark.cache import SparkCache
            from pyairbyte_spark.session import get_spark

            self._cache = SparkCache(
                get_spark(), self._warehouse_dir or tempfile.mkdtemp(prefix="mcp-wh-")
            )
        return self._cache

    def resolve_source(self, spec: str, config: dict | None = None):
        key = f"{spec}\x1f{json.dumps(config or {}, sort_keys=True)}"
        if key not in self._sources:
            if self._source_resolver is not None:
                self._sources[key] = self._source_resolver(spec, config)
            else:
                self._sources[key] = self._default_resolve(spec, config)
        return self._sources[key]

    @staticmethod
    def _default_resolve(spec: str, config: dict | None):
        from pyairbyte_spark import exceptions as exc
        from pyairbyte_spark.cli import _resolve_source

        if spec in ("faker", "fixture") or spec.startswith(
            ("benchmark", "manifest:")
        ):
            src = _resolve_source(spec)
            if config:
                src.config = {**getattr(src, "config", {}), **config}
            return src
        if " " not in spec:
            # Space-free specs are registry names ("source-faker");
            # anything else is a connector argv string.
            from pyairbyte_spark.factories import get_source

            try:
                return get_source(spec, config=config)
            except exc.PyAirbyteError:
                pass
        src = _resolve_source(spec)  # argv string / registry fallback
        if config:
            # Same merge the faker/fixture/manifest branch does — the
            # caller's config must reach argv-launched connectors too.
            src.config = {**getattr(src, "config", {}), **config}
        return src


# -- tool registry -----------------------------------------------------------


@dataclass
class ToolDef:
    name: str
    description: str
    input_schema: dict
    handler: Callable[[LocalToolHost, dict], Any]
    field_order: tuple = field(default=())

    def to_listing(self) -> dict:
        return {
            "name": self.name,
            "description": self.description,
            "inputSchema": self.input_schema,
        }


def _source_schema(extra: dict | None = None, required: list[str] | None = None) -> dict:
    props = {
        "source": {
            "type": "string",
            "description": "Source specifier: registry name, faker, fixture, "
            "benchmark:N, manifest:/path.json, or a connector argv string",
        },
        "config": {"type": "object", "description": "Connector configuration"},
    }
    props.update(extra or {})
    return {
        "type": "object",
        "properties": props,
        "required": ["source", *(required or [])],
    }


def _build_tool_defs() -> list[ToolDef]:
    from pyairbyte_spark import tools as t

    return [
        ToolDef(
            "validate_connector_config",
            "Run the source's connection check and report success/failure.",
            _source_schema(),
            lambda h, a: t.validate_source(
                h.resolve_source(a["source"], a.get("config"))
            ),
        ),
        ToolDef(
            "list_source_streams",
            "List stream names the source offers.",
            _source_schema(),
            lambda h, a: t.list_source_streams(
                h.resolve_source(a["source"], a.get("config"))
            ),
        ),
        ToolDef(
            "get_source_stream_json_schema",
            "JSON schema of one stream.",
            _source_schema({"stream_name": {"type": "string"}}, ["stream_name"]),
            lambda h, a: t.get_stream_json_schema(
                h.resolve_source(a["source"], a.get("config")), a["stream_name"]
            ),
        ),
        ToolDef(
            "read_source_stream_records",
            "Read up to `limit` records from one stream.",
            _source_schema(
                {
                    "stream_name": {"type": "string"},
                    "limit": {"type": "integer", "default": 100},
                },
                ["stream_name"],
            ),
            lambda h, a: t.read_stream_records(
                h.resolve_source(a["source"], a.get("config")),
                a["stream_name"],
                limit=int(a.get("limit", 100)),
            ),
        ),
        ToolDef(
            "get_stream_previews",
            "Sample a few records from each (or selected) streams.",
            _source_schema(
                {
                    "streams": {"type": "array", "items": {"type": "string"}},
                    "limit": {"type": "integer", "default": 5},
                }
            ),
            lambda h, a: t.get_stream_previews(
                h.resolve_source(a["source"], a.get("config")),
                a.get("streams"),
                limit=int(a.get("limit", 5)),
            ),
        ),
        ToolDef(
            "sync_source_to_cache",
            "Sync source streams into the default cache; returns per-stream record counts.",
            _source_schema(
                {
                    "streams": {"type": "array", "items": {"type": "string"}},
                    "write_strategy": {"type": "string", "default": "auto"},
                }
            ),
            lambda h, a: t.sync_source_to_cache(
                h.resolve_source(a["source"], a.get("config")),
                h.cache,
                streams=a.get("streams"),
                write_strategy=a.get("write_strategy", "auto"),
            ),
        ),
        ToolDef(
            "list_cached_streams",
            "List streams present in the default cache.",
            {"type": "object", "properties": {}},
            lambda h, a: t.list_cached_streams(h.cache),
        ),
        ToolDef(
            "describe_default_cache",
            "Cache type, warehouse location and stream list.",
            {"type": "object", "properties": {}},
            lambda h, a: t.describe_cache(h.cache),
        ),
        ToolDef(
            "run_sql_query",
            "Run a guarded read-only SQL statement against the cache "
            "(single SELECT/DESCRIBE/SHOW/EXPLAIN only).",
            {
                "type": "object",
                "properties": {
                    "sql": {"type": "string"},
                    "max_records": {"type": "integer", "default": 1000},
                },
                "required": ["sql"],
            },
            lambda h, a: t.run_sql_query(
                h.cache, a["sql"], max_records=int(a.get("max_records", 1000))
            ),
        ),
        # -- ACID table maintenance (commit-log caches) ----------------------
        ToolDef(
            "get_table_history",
            "Commit history (version/op/entry count) for one cached "
            "stream's table. Requires a commit-log format cache.",
            {
                "type": "object",
                "properties": {"stream_name": {"type": "string"}},
                "required": ["stream_name"],
            },
            lambda h, a: t.get_table_history(h.cache, a["stream_name"]),
        ),
        ToolDef(
            "read_table_changes",
            "Change data feed: row changes between two commit versions "
            "(insert/update_postimage/delete), capped at max_records.",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "from_version": {"type": "integer"},
                    "to_version": {"type": "integer"},
                    "max_records": {"type": "integer", "default": 1000},
                },
                "required": ["stream_name", "from_version"],
            },
            lambda h, a: t.read_table_changes(
                h.cache,
                a["stream_name"],
                int(a["from_version"]),
                (None if a.get("to_version") is None else int(a["to_version"])),
                max_records=int(a.get("max_records", 1000)),
            ),
        ),
        ToolDef(
            "compact_table",
            "OPTIMIZE-style maintenance: collapse append fragmentation "
            "into one data dir; sort_by clusters files for data skipping.",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "sort_by": {"type": "array", "items": {"type": "string"}},
                    "target_files": {"type": "integer"},
                },
                "required": ["stream_name"],
            },
            lambda h, a: t.compact_table(
                h.cache,
                a["stream_name"],
                sort_by=a.get("sort_by"),
                target_files=(
                    None
                    if a.get("target_files") is None
                    else int(a["target_files"])
                ),
            ),
        ),
        ToolDef(
            "delete_table_rows",
            "File-pruned DELETE FROM <stream> WHERE <predicates>. "
            "Predicates: [[col, op, value], ...] with ops = < <= > >= "
            "in is_null not_null (conjunctive; SQL semantics — NULL "
            "result keeps the row).",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "predicates": {
                        "type": "array",
                        "items": {"type": "array"},
                    },
                },
                "required": ["stream_name", "predicates"],
            },
            lambda h, a: t.delete_table_rows(
                h.cache, a["stream_name"], a["predicates"]
            ),
        ),
        ToolDef(
            "update_table_rows",
            "File-pruned UPDATE <stream> SET <assignments> WHERE "
            "<predicates>. Assignments map column -> SQL expression "
            "(evaluated against pre-update values).",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "predicates": {
                        "type": "array",
                        "items": {"type": "array"},
                    },
                    "assignments": {"type": "object"},
                },
                "required": ["stream_name", "predicates", "assignments"],
            },
            lambda h, a: t.update_table_rows(
                h.cache, a["stream_name"], a["predicates"], a["assignments"]
            ),
        ),
        ToolDef(
            "rename_table_column",
            "Metadata-only column rename on a commit-log table (zero "
            "data I/O at any size).",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "old": {"type": "string"},
                    "new": {"type": "string"},
                },
                "required": ["stream_name", "old", "new"],
            },
            lambda h, a: t.rename_table_column(
                h.cache, a["stream_name"], a["old"], a["new"]
            ),
        ),
        ToolDef(
            "drop_table_column",
            "Metadata-only column drop on a commit-log table (zero "
            "data I/O; bytes reclaimed by a later full rewrite).",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "column": {"type": "string"},
                },
                "required": ["stream_name", "column"],
            },
            lambda h, a: t.drop_table_column(
                h.cache, a["stream_name"], a["column"]
            ),
        ),
        ToolDef(
            "vacuum_table",
            "Reclaim data dirs unreferenced by the most recent commits "
            "(disables time travel past the retained versions).",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "keep_commits": {"type": "integer", "default": 1},
                },
                "required": ["stream_name"],
            },
            lambda h, a: t.vacuum_table(
                h.cache,
                a["stream_name"],
                keep_commits=int(a.get("keep_commits", 1)),
            ),
        ),
        ToolDef(
            "restore_table",
            "RESTORE a stream's table to an earlier commit version — a "
            "new forward commit (auditable rollback, zero data I/O; the "
            "target version must not be vacuumed).",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "version": {"type": "integer"},
                },
                "required": ["stream_name", "version"],
            },
            lambda h, a: t.restore_table(
                h.cache, a["stream_name"], int(a["version"])
            ),
        ),
        ToolDef(
            "set_table_check",
            "Persist a CHECK constraint on a stream's table (SQL boolean "
            "expression over logical columns; NULL passes). Validates "
            "existing rows first; every later write — including UPDATE "
            "rewrites — enforces it in-flight.",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "name": {"type": "string"},
                    "expr": {"type": "string"},
                },
                "required": ["stream_name", "name", "expr"],
            },
            lambda h, a: t.set_table_check(
                h.cache, a["stream_name"], a["name"], a["expr"]
            ),
        ),
        ToolDef(
            "drop_table_check",
            "Remove a persisted CHECK constraint from a stream's table.",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "name": {"type": "string"},
                },
                "required": ["stream_name", "name"],
            },
            lambda h, a: t.drop_table_check(h.cache, a["stream_name"], a["name"]),
        ),
        ToolDef(
            "get_table_checks",
            "The persisted CHECK constraints of a stream's table "
            "(name → SQL expression).",
            {
                "type": "object",
                "properties": {"stream_name": {"type": "string"}},
                "required": ["stream_name"],
            },
            lambda h, a: t.get_table_checks(h.cache, a["stream_name"]),
        ),
        ToolDef(
            "analyze_table_ndv",
            "ANALYZE: compute + persist approximate-distinct (HLL) "
            "statistics for the given columns in the stream table's "
            "stats sidecar (one scan for all columns).",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "columns": {
                        "type": "array",
                        "items": {"type": "string"},
                    },
                },
                "required": ["stream_name", "columns"],
            },
            lambda h, a: t.analyze_table_ndv(
                h.cache, a["stream_name"], list(a["columns"])
            ),
        ),
        ToolDef(
            "get_table_ndv",
            "Per-column approximate distinct counts from maintained NDV "
            "stats — no data scan; auto-catches-up from the change feed "
            "(append/compact) or re-analyzes after DML.",
            {
                "type": "object",
                "properties": {"stream_name": {"type": "string"}},
                "required": ["stream_name"],
            },
            lambda h, a: t.get_table_ndv(h.cache, a["stream_name"]),
        ),
        ToolDef(
            "profile_table",
            "Deequ-style column profile of a cached stream: per-column "
            "row/null counts, typed min/max, and HLL approx-distinct — "
            "two passes regardless of column count.",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "columns": {
                        "type": "array",
                        "items": {"type": "string"},
                    },
                },
                "required": ["stream_name"],
            },
            lambda h, a: t.profile_table(
                h.cache, a["stream_name"], a.get("columns")
            ),
        ),
        ToolDef(
            "clone_table",
            "SHALLOW CLONE a cached stream: zero-copy snapshot as a "
            "new stream table referencing the source's files; diverges "
            "independently (compact_table materializes it).",
            {
                "type": "object",
                "properties": {
                    "source_stream": {"type": "string"},
                    "dest_stream": {"type": "string"},
                },
                "required": ["source_stream", "dest_stream"],
            },
            lambda h, a: t.clone_table(
                h.cache, a["source_stream"], a["dest_stream"]
            ),
        ),
        ToolDef(
            "vector_search_table",
            "Cosine top-k similarity search over a cached stream's "
            "embedding column: the row whose id_col equals query_id is "
            "the query vector; returns its k nearest neighbors (exact "
            "brute force, JVM-side dot products).",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "query_id": {"type": "integer"},
                    "id_col": {"type": "string"},
                    "vec_col": {"type": "string"},
                    "k": {"type": "integer"},
                },
                "required": ["stream_name", "query_id"],
            },
            lambda h, a: t.vector_search_table(
                h.cache,
                a["stream_name"],
                a["query_id"],
                id_col=a.get("id_col", "vec_id"),
                vec_col=a.get("vec_col", "embedding"),
                k=a.get("k", 5),
            ),
        ),
        ToolDef(
            "get_index_health",
            "Retrain trigger for a stream-maintained ANN index: relative "
            "quantization error of vectors appended since the last "
            "(re)build vs the build corpus — 'retrain' trips past the "
            "drift threshold (kind: pq or ivf).",
            {
                "type": "object",
                "properties": {
                    "index_name": {"type": "string"},
                    "kind": {"type": "string", "enum": ["pq", "ivf"]},
                },
                "required": ["index_name"],
            },
            lambda h, a: t.get_index_health(
                h.cache, a["index_name"], kind=a.get("kind", "pq")
            ),
        ),
        ToolDef(
            "get_maintenance_plan",
            "Table doctor: which maintenance actions are worth running on "
            "a cached stream's table (compact for dir sprawl or MoR "
            "deletion-vector buildup, refresh_bloom for coverage decay, "
            "vacuum for commit sprawl, resolve for a stuck txn head) — "
            "one metadata inspection, no data I/O.",
            {
                "type": "object",
                "properties": {"stream_name": {"type": "string"}},
                "required": ["stream_name"],
            },
            lambda h, a: t.get_maintenance_plan(h.cache, a["stream_name"]),
        ),
        ToolDef(
            "get_store_maintenance_plan",
            "Warehouse doctor: ONE call returning every table's "
            "maintenance plan, every derived index's debt signals "
            "(tombstone debt from sync retractions -> fold_*_index, "
            "stale clustering -> refresh_*_index, hot-band skew), and "
            "the txn-group decision-file backlog "
            "(vacuum_txn_decisions).",
            {"type": "object", "properties": {}},
            lambda h, a: t.get_store_maintenance_plan(h.cache),
        ),
        ToolDef(
            "apply_store_maintenance",
            "EXECUTE the warehouse doctor's prescriptions in one call: "
            "compactions (bloom re-cover folded into the same rewrite), "
            "vacuums, index tombstone folds + clustering refreshes, and "
            "the txn-decision vacuum — each action isolated. "
            "dry_run=true reports what WOULD run without touching "
            "anything; judgment calls (drop_ref/review_ingest/resolve) "
            "are listed as skipped, never auto-applied.",
            {
                "type": "object",
                "properties": {"dry_run": {"type": "boolean"}},
            },
            lambda h, a: t.apply_store_maintenance(
                h.cache, dry_run=bool(a.get("dry_run"))
            ),
        ),
        ToolDef(
            "verify_table",
            "FSCK a cached stream's table: manifest resolution, data-file "
            "presence + size drift, DV/bloom sidecars, txn-decision "
            "invariants, orphan dirs. Metadata-only; deep=true checks "
            "every readable snapshot, not just the latest.",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "deep": {"type": "boolean"},
                },
                "required": ["stream_name"],
            },
            lambda h, a: t.verify_table(
                h.cache, a["stream_name"], deep=a.get("deep", False)
            ),
        ),
        ToolDef(
            "build_table_sum_stats",
            "Backfill per-file column SUMs into a cached stream's "
            "manifest stats so sum/avg pushdowns (aggregate_table_rows) "
            "answer from metadata with zero file reads. One job over "
            "exactly the files missing sums; row-preserving commit.",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "columns": {
                        "type": "array", "items": {"type": "string"},
                    },
                },
                "required": ["stream_name"],
            },
            lambda h, a: t.build_table_sum_stats(
                h.cache, a["stream_name"], a.get("columns")
            ),
        ),
        ToolDef(
            "rebucket_table",
            "Bucket-layout evolution: rewrite a cached stream's table "
            "with a new merge-bucket count (omit n_buckets to un-bucket). "
            "Rows identical (change feed silent); later merges hash with "
            "the new layout.",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "n_buckets": {"type": "integer"},
                },
                "required": ["stream_name"],
            },
            lambda h, a: t.rebucket_table(
                h.cache, a["stream_name"], a.get("n_buckets")
            ),
        ),
        ToolDef(
            "set_table_clustering",
            "Write-time clustering: every later append to the stream's "
            "table range-sorts on the given columns before staging, so "
            "range/point scans stay file-pruned through ingest without "
            "compaction cycles. Omit columns to clear.",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "columns": {
                        "type": "array",
                        "items": {"type": "string"},
                    },
                },
                "required": ["stream_name"],
            },
            lambda h, a: t.set_table_clustering(
                h.cache, a["stream_name"], a.get("columns")
            ),
        ),
        ToolDef(
            "build_search_index",
            "Materialize a persisted inverted text index over a cached "
            "stream (token-clustered postings + mergeable corpus stats): "
            "keyword searches then probe O(touched postings) instead of "
            "rescanning the corpus.",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "index_name": {"type": "string"},
                    "id_col": {"type": "string"},
                    "text_col": {"type": "string"},
                },
                "required": ["stream_name"],
            },
            lambda h, a: t.build_search_index(
                h.cache,
                a["stream_name"],
                index_name=a.get("index_name", "bm25"),
                id_col=a.get("id_col", "doc_id"),
                text_col=a.get("text_col", "text"),
            ),
        ),
        ToolDef(
            "sync_search_index",
            "Catch the inverted text index up to its source table's "
            "current snapshot from the change feed: deletions/updates "
            "retract as tombstone postings, inserts append — one atomic "
            "transaction (postings + corpus stats + cursor).",
            {
                "type": "object",
                "properties": {"index_name": {"type": "string"}},
                "required": [],
            },
            lambda h, a: t.sync_search_index(
                h.cache, a.get("index_name", "bm25")
            ),
        ),
        ToolDef(
            "build_dedup_index",
            "Materialize a persisted MinHash-LSH near-duplicate index "
            "over a cached stream (band-clustered buckets + signatures), "
            "recording the snapshot it covers; find_near_duplicates then "
            "probes it in O(touched buckets) and sync_dedup_index "
            "maintains it from the table's change feed.",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "index_name": {"type": "string"},
                    "id_col": {"type": "string"},
                    "text_col": {"type": "string"},
                },
                "required": ["stream_name"],
            },
            lambda h, a: t.build_dedup_index(
                h.cache,
                a["stream_name"],
                index_name=a.get("index_name", "mh"),
                id_col=a.get("id_col", "doc_id"),
                text_col=a.get("text_col", "text"),
            ),
        ),
        ToolDef(
            "get_search_index_health",
            "Health of the inverted text index: tombstone debt (dead "
            "rows from sync retractions taxing every probe) and stale "
            "clustering, with the repair verb named per issue.",
            {
                "type": "object",
                "properties": {"index_name": {"type": "string"}},
                "required": [],
            },
            lambda h, a: t.get_search_index_health(
                h.cache, a.get("index_name", "bm25")
            ),
        ),
        ToolDef(
            "fold_search_index",
            "Fold the text index's tombstone debt: rewrite postings as "
            "their net state and recluster. Guarded — never clobbers a "
            "concurrent sync (folded=false means re-run).",
            {
                "type": "object",
                "properties": {"index_name": {"type": "string"}},
                "required": [],
            },
            lambda h, a: t.fold_search_index(
                h.cache, a.get("index_name", "bm25")
            ),
        ),
        ToolDef(
            "fold_dedup_index",
            "Fold the near-duplicate index's tombstone debt: net band "
            "rows + signatures pruned to live docs, then recluster. "
            "Guarded against concurrent syncs.",
            {
                "type": "object",
                "properties": {"index_name": {"type": "string"}},
                "required": [],
            },
            lambda h, a: t.fold_dedup_index(
                h.cache, a.get("index_name", "mh")
            ),
        ),
        ToolDef(
            "sync_dedup_index",
            "Catch the near-duplicate index up to its source table's "
            "current snapshot: deleted documents stop matching (band "
            "rows retract), updated documents re-sign — one atomic "
            "transaction.",
            {
                "type": "object",
                "properties": {"index_name": {"type": "string"}},
                "required": [],
            },
            lambda h, a: t.sync_dedup_index(
                h.cache, a.get("index_name", "mh")
            ),
        ),
        ToolDef(
            "build_vector_index",
            "Materialize a persisted IVF vector index over a cached "
            "stream (frozen coarse quantizer + cid-clustered inverted "
            "lists) with a provenance cursor, so sync_vector_index can "
            "maintain it from the table's change feed.",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "index_name": {"type": "string"},
                    "id_col": {"type": "string"},
                    "vec_col": {"type": "string"},
                    "n_centroids": {"type": "integer"},
                },
                "required": ["stream_name"],
            },
            lambda h, a: t.build_vector_index(
                h.cache,
                a["stream_name"],
                index_name=a.get("index_name", "ivf"),
                id_col=a.get("id_col", "vec_id"),
                vec_col=a.get("vec_col", "embedding"),
                n_centroids=a.get("n_centroids", 8),
            ),
        ),
        ToolDef(
            "sync_vector_index",
            "Catch the IVF vector index up to its source table's "
            "current snapshot: deleted vectors stop matching (list "
            "rows retract in their quantizer cell), updated vectors "
            "re-assign — one atomic transaction; the quantizer stays "
            "frozen (get_index_health is the retrain trigger).",
            {
                "type": "object",
                "properties": {"index_name": {"type": "string"}},
                "required": [],
            },
            lambda h, a: t.sync_vector_index(
                h.cache, a.get("index_name", "ivf")
            ),
        ),
        ToolDef(
            "search_documents",
            "BM25 keyword search over a cached stream: probes the "
            "persisted inverted index when one exists, else one exact "
            "full-scan scoring pass. Top-k {id, n_hit_terms, bm25}.",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "query": {"type": "string"},
                    "k": {"type": "integer"},
                    "index_name": {"type": "string"},
                },
                "required": ["stream_name", "query"],
            },
            lambda h, a: t.search_documents(
                h.cache,
                a["stream_name"],
                a["query"],
                k=a.get("k", 10),
                index_name=a.get("index_name", "bm25"),
            ),
        ),
        ToolDef(
            "count_table_rows",
            "Exact filtered row count with aggregate pushdown into the "
            "table manifest: unfiltered counts touch zero data files, "
            "clustered-range counts read only boundary files. Predicates "
            "are DNF: [[['col','op',value],...],...] (ops: = < <= > >= "
            "in is_null not_null).",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "predicates": {"type": "array"},
                },
                "required": ["stream_name"],
            },
            lambda h, a: t.count_table_rows(
                h.cache, a["stream_name"], a.get("predicates")
            ),
        ),
        ToolDef(
            "aggregate_table_rows",
            "Exact filtered COUNT/SUM/MIN/MAX/AVG list with pushdown "
            "into the table manifest: aggs are [['fn','col'],...] "
            "('*' column for count). Must-match files answer from "
            "footer stats without being read (sums need "
            "build_table_sum_stats or a harvest_sums cache); only "
            "boundary files scan. Predicates share count_table_rows' "
            "DNF shape.",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "aggs": {
                        "type": "array",
                        "items": {
                            "type": "array",
                            "items": {"type": "string"},
                        },
                    },
                    "predicates": {"type": "array"},
                },
                "required": ["stream_name", "aggs"],
            },
            lambda h, a: t.aggregate_table_rows(
                h.cache, a["stream_name"], a["aggs"], a.get("predicates")
            ),
        ),
        ToolDef(
            "create_table_branch",
            "Fork a write-audit-publish branch of a cached stream's "
            "table: candidate writes land on the branch invisibly while "
            "main keeps serving the audited state. One tiny ref PUT; no "
            "data moves.",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "branch": {"type": "string"},
                },
                "required": ["stream_name", "branch"],
            },
            lambda h, a: t.create_table_branch(
                h.cache, a["stream_name"], a["branch"]
            ),
        ),
        ToolDef(
            "publish_table_branch",
            "Publish an audited branch: fast-forward main to the branch "
            "tip with ONE atomic commit (refused if main diverged past "
            "the fork point; mode='rebase-appends' grafts an append-only "
            "branch onto an advanced main). Set drop=false to keep the "
            "ref.",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "branch": {"type": "string"},
                    "drop": {"type": "boolean"},
                    "mode": {"type": "string", "enum": ["ff", "rebase-appends"]},
                },
                "required": ["stream_name", "branch"],
            },
            lambda h, a: t.publish_table_branch(
                h.cache, a["stream_name"], a["branch"],
                drop=a.get("drop", True), mode=a.get("mode", "ff"),
            ),
        ),
        ToolDef(
            "drop_table_branch",
            "Abandon an audit branch without publishing (releases the "
            "vacuum retention floor the ref was holding).",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "branch": {"type": "string"},
                },
                "required": ["stream_name", "branch"],
            },
            lambda h, a: t.drop_table_branch(
                h.cache, a["stream_name"], a["branch"]
            ),
        ),
        ToolDef(
            "list_table_refs",
            "All named refs of a cached stream's table: write-audit-"
            "publish branches (with fork base) and version tags.",
            {
                "type": "object",
                "properties": {"stream_name": {"type": "string"}},
                "required": ["stream_name"],
            },
            lambda h, a: t.list_table_refs(h.cache, a["stream_name"]),
        ),
        ToolDef(
            "find_near_duplicates",
            "Near-duplicate check at ingest: probe the stream's persisted "
            "MinHash-LSH index (O(touched buckets)) for docs similar to the "
            "given text; falls back to a full LSH pass when no index "
            "exists. n_agree/12 estimates Jaccard similarity.",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "text": {"type": "string"},
                    "index_name": {"type": "string"},
                    "min_agree": {"type": "integer"},
                },
                "required": ["stream_name", "text"],
            },
            lambda h, a: t.find_near_duplicates(
                h.cache,
                a["stream_name"],
                a["text"],
                index_name=a.get("index_name", "mh"),
                min_agree=a.get("min_agree", 6),
                include_index_state=True,
            ),
        ),
        ToolDef(
            "get_consistent_snapshot",
            "Pin a torn-free version vector across streams: pass chain="
            "[[src,dst],...] for follower-maintained pipelines (each hop's "
            "provenance watermark guarantees clean JOIN agg reflects ONE "
            "upstream snapshot, however mid-update the pipeline is) or "
            "streams=[...] for independent tables (pinned at capture). "
            "Read the pinned data via the returned versions with "
            "read-version / time-travel surfaces.",
            {
                "type": "object",
                "properties": {
                    "streams": {
                        "type": "array", "items": {"type": "string"},
                    },
                    "chain": {
                        "type": "array",
                        "items": {
                            "type": "array",
                            "items": {"type": "string"},
                            "minItems": 2,
                            "maxItems": 2,
                        },
                    },
                    "follower_name": {"type": "string"},
                },
            },
            lambda h, a: t.get_consistent_snapshot(
                h.cache,
                streams=a.get("streams"),
                chain=a.get("chain"),
                follower_name=a.get("follower_name", "feed"),
            ),
        ),
        ToolDef(
            "get_dedup_index_health",
            "Health of the persisted MinHash-LSH dedup index: unclustered "
            "fraction (ingest-time appends decay probe pruning; refresh "
            "repairs) and hot-band skew (boilerplate ingest collapses docs "
            "into one bucket — a data problem, filter upstream).",
            {
                "type": "object",
                "properties": {"index_name": {"type": "string"}},
            },
            lambda h, a: t.get_dedup_index_health(
                h.cache, index_name=a.get("index_name", "mh")
            ),
        ),
        ToolDef(
            "refresh_dedup_index",
            "Recluster the dedup index's unclustered append tail (O(tail), "
            "rows identical) so near-dup probe pruning returns to the "
            "compacted level; returns the post-refresh coverage watermark.",
            {
                "type": "object",
                "properties": {
                    "index_name": {"type": "string"},
                    "target_files": {"type": "integer"},
                },
            },
            lambda h, a: t.refresh_dedup_index(
                h.cache,
                index_name=a.get("index_name", "mh"),
                target_files=a.get("target_files"),
            ),
        ),
        ToolDef(
            "scan_duplicate_spans",
            "ExactSubstr dedup report: the documents with the largest "
            "corpus-duplicated token spans (positional n-grams, in-doc "
            "repeats count) and their span-removed cleaned text.",
            {
                "type": "object",
                "properties": {
                    "stream_name": {"type": "string"},
                    "n": {"type": "integer"},
                    "limit": {"type": "integer"},
                },
                "required": ["stream_name"],
            },
            lambda h, a: t.scan_duplicate_spans(
                h.cache,
                a["stream_name"],
                n=a.get("n", 10),
                limit=a.get("limit", 20),
            ),
        ),
        ToolDef(
            "get_bloom_coverage",
            "Bloom point-lookup index coverage watermark for a cached "
            "stream: live files covered vs uncovered (compaction/DML decay "
            "coverage until an only_missing rebuild; reads stay exact).",
            {
                "type": "object",
                "properties": {"stream_name": {"type": "string"}},
                "required": ["stream_name"],
            },
            lambda h, a: t.get_bloom_coverage(h.cache, a["stream_name"]),
        ),
        # -- registry browse (reference mcp/registry.py:44-289) --------------
        ToolDef(
            "list_connectors",
            "Browse the connector registry: all registered connector names, "
            "optionally filtered by keyword, type (source/destination) and "
            "install types (python/yaml/docker/java).",
            {
                "type": "object",
                "properties": {
                    "keyword_filter": {"type": "string"},
                    "connector_type_filter": {
                        "type": "string",
                        "enum": ["source", "destination"],
                    },
                    "install_types": {
                        "type": "array",
                        "items": {
                            "type": "string",
                            "enum": ["python", "yaml", "docker", "java"],
                        },
                    },
                },
            },
            lambda h, a: _list_connectors(
                keyword_filter=a.get("keyword_filter"),
                connector_type_filter=a.get("connector_type_filter"),
                install_types=a.get("install_types"),
            ),
        ),
        ToolDef(
            "get_connector_info",
            "Metadata, docs URL, install types and manifest URL for one "
            "registered connector.",
            {
                "type": "object",
                "properties": {"connector_name": {"type": "string"}},
                "required": ["connector_name"],
            },
            lambda h, a: _get_connector_info(a["connector_name"]),
        ),
    ]


def _list_connectors(
    *,
    keyword_filter: str | None = None,
    connector_type_filter: str | None = None,
    install_types: list[str] | None = None,
) -> list[str]:
    from pyairbyte_spark import registry

    if install_types:
        names: set[str] = set()
        for it in install_types:
            names.update(registry.get_available_connectors(install_type=it))
        connectors = sorted(names)
    else:
        connectors = registry.get_available_connectors()
    if keyword_filter:
        kw = keyword_filter.lower()
        connectors = [c for c in connectors if kw in c.lower()]
    if connector_type_filter:
        connectors = [
            c for c in connectors if c.startswith(f"{connector_type_filter}-")
        ]
    return sorted(connectors)


def _get_connector_info(connector_name: str) -> dict | str:
    from pyairbyte_spark import registry

    try:
        meta = registry.get_connector_metadata(connector_name)
    except Exception:  # noqa: BLE001 - MCP-friendly sentinel, not a crash
        return "Connector not found."
    short = connector_name.split("-", 1)[-1]
    kind = "sources" if connector_name.startswith("source-") else "destinations"
    return {
        "connector_name": meta.name,
        "latest_available_version": meta.latest_available_version,
        "language": meta.language.value if meta.language else None,
        "install_types": sorted(t.value for t in meta.install_types),
        "documentation_url": f"https://docs.airbyte.com/integrations/{kind}/{short}",
        "manifest_url": (
            "https://connectors.airbyte.com/files/metadata/airbyte/"
            f"{connector_name}/latest/manifest.yaml"
        ),
    }


# -- interactive UI tools (reference mcp/interactive/) ------------------------


def _html_escape(value: Any) -> str:
    import html

    return html.escape(str(value if value is not None else ""))


def _html_table(title: str, headers: list[str], rows: list[list[Any]]) -> str:
    head = "".join(f"<th>{_html_escape(h)}</th>" for h in headers)
    body = "".join(
        "<tr>" + "".join(f"<td>{_html_escape(c)}</td>" for c in row) + "</tr>"
        for row in rows
    )
    return (
        "<!doctype html><html><body>"
        f"<h2>{_html_escape(title)}</h2>"
        f"<table border='1' cellpadding='4'><tr>{head}</tr>{body}</table>"
        f"<p>{len(rows)} rows</p></body></html>"
    )


def _ui_result(summary: str, uri: str, html: str) -> dict:
    """Tool result carrying both a text summary (for text-only hosts)
    and an embedded HTML resource (for UI-capable hosts) — the shape of
    the reference's interactive tools (``mcp/interactive/``)."""
    return {
        "__mcp_content__": [
            {"type": "text", "text": summary},
            {
                "type": "resource",
                "resource": {"uri": uri, "mimeType": "text/html", "text": html},
            },
        ]
    }


def _build_interactive_tool_defs() -> list[ToolDef]:
    def _show_connectors(h: LocalToolHost, a: dict) -> dict:
        from pyairbyte_spark import registry

        names = _list_connectors(
            keyword_filter=a.get("keyword_filter"),
            connector_type_filter=a.get("connector_type_filter"),
        )
        rows = []
        for n in names:
            meta = registry.get_connector_metadata(n)
            rows.append(
                [
                    n,
                    meta.language.value if meta.language else "",
                    ", ".join(sorted(t.value for t in meta.install_types)),
                    meta.latest_available_version or "",
                ]
            )
        html = _html_table(
            "Available connectors",
            ["name", "language", "install types", "version"],
            rows,
        )
        return _ui_result(
            f"{len(rows)} connectors", "ui://connectors/list", html
        )

    def _show_sync_history(h: LocalToolHost, a: dict) -> dict:
        ws = h.get_cloud_workspace(a.get("workspace_id"))
        jobs = ws.list_sync_jobs(
            connection_id=a["connection_id"], limit=int(a.get("limit", 20))
        )
        rows = [
            [
                j.get("jobId"),
                j.get("jobType", "sync"),
                j.get("status"),
                j.get("rowsSynced", 0),
                j.get("bytesSynced", 0),
            ]
            for j in jobs
        ]
        html = _html_table(
            f"Sync history — {a['connection_id']}",
            ["job", "type", "status", "rows", "bytes"],
            rows,
        )
        return _ui_result(
            f"{len(rows)} jobs for {a['connection_id']}",
            f"ui://connections/{a['connection_id']}/history",
            html,
        )

    def _show_workspace_status(h: LocalToolHost, a: dict) -> dict:
        ws = h.get_cloud_workspace(a.get("workspace_id"))
        rows = []
        for conn in ws.list_connections():
            jobs = ws.list_sync_jobs(connection_id=conn.connection_id, limit=1)
            latest = jobs[0] if jobs else {}
            rows.append(
                [
                    conn.connection_id,
                    conn.name or "",
                    latest.get("jobId", ""),
                    latest.get("status", "never run"),
                    latest.get("rowsSynced", ""),
                ]
            )
        html = _html_table(
            f"Workspace {ws.workspace_id} sync status",
            ["connection", "name", "latest job", "status", "rows"],
            rows,
        )
        return _ui_result(
            f"{len(rows)} connections in {ws.workspace_id}",
            f"ui://workspaces/{ws.workspace_id}/status",
            html,
        )

    ws_prop = {
        "workspace_id": {
            "type": "string",
            "description": "Workspace ID (default: AIRBYTE_CLOUD_WORKSPACE_ID)",
        }
    }
    return [
        ToolDef(
            "show_connectors_list",
            "Render the connector registry as an HTML table (UI-capable "
            "hosts) plus a text summary.",
            {
                "type": "object",
                "properties": {
                    "keyword_filter": {"type": "string"},
                    "connector_type_filter": {
                        "type": "string",
                        "enum": ["source", "destination"],
                    },
                },
            },
            _show_connectors,
        ),
        ToolDef(
            "show_connection_sync_history",
            "Render one connection's sync-job history as an HTML table.",
            {
                "type": "object",
                "properties": {
                    **ws_prop,
                    "connection_id": {"type": "string"},
                    "limit": {"type": "integer", "default": 20},
                },
                "required": ["connection_id"],
            },
            _show_sync_history,
        ),
        ToolDef(
            "show_workspace_sync_status",
            "Render every connection's latest sync status as an HTML table.",
            {"type": "object", "properties": dict(ws_prop)},
            _show_workspace_status,
        ),
    ]


# -- prompts (reference mcp/prompts.py) ---------------------------------------


@dataclass
class PromptDef:
    name: str
    description: str
    arguments: tuple = ()  # (name, description, required) triples
    render: Callable[[dict], str] = lambda a: ""

    def to_listing(self) -> dict:
        return {
            "name": self.name,
            "description": self.description,
            "arguments": [
                {"name": n, "description": d, "required": r}
                for n, d, r in self.arguments
            ],
        }


def _test_my_tools(args: dict) -> str:
    text = (
        "Exercise every tool this MCP server exposes and report whether each "
        "works.\n\n"
        "Approach:\n"
        "- Walk the tool list in order; prefer read-only calls.\n"
        "- For tools that write (sync_source_to_cache), use the bundled "
        "'faker' source so no external system is touched.\n"
        "- Verify each tool accepts its required arguments, returns the "
        "documented shape, and fails cleanly on bad input.\n"
        "- Finish with a table: tool name, status, notes."
    )
    if args.get("scope"):
        text += f"\n\nScope constraints from the caller:\n{args['scope']}"
    return text


def _explore_source(args: dict) -> str:
    source = args.get("source", "faker")
    return (
        f"Explore the '{source}' source end to end:\n"
        f"1. validate_connector_config to confirm it can connect.\n"
        f"2. list_source_streams, then get_source_stream_json_schema for "
        f"each stream of interest.\n"
        f"3. get_stream_previews for a quick look at real records.\n"
        f"4. sync_source_to_cache, then describe_default_cache and a "
        f"run_sql_query aggregate to sanity-check the landed row counts.\n"
        f"Summarize the streams, schemas and row counts you found."
    )


PROMPT_DEFS: list[PromptDef] = [
    PromptDef(
        "test-my-tools",
        "Test all available MCP tools to confirm they are working properly",
        (("scope", "Optional free-form focus or constraints for testing", False),),
        _test_my_tools,
    ),
    PromptDef(
        "explore-a-source",
        "Guided walkthrough: validate, inspect, preview and sync one source",
        (("source", "Source specifier (default: faker)", False),),
        _explore_source,
    ),
]


def _build_cloud_tool_defs() -> list[ToolDef]:
    """Hosted-workspace tools (reference ``mcp/cloud.py:292-1016``).

    Deletion tools are deliberately not exposed: the workspace API's
    safe-mode guard is a name convention, which an agent can satisfy by
    renaming — destructive operations stay in the Python API.
    """

    def _ws(h: LocalToolHost, a: dict):
        return h.get_cloud_workspace(a.get("workspace_id"))

    ws_prop = {
        "workspace_id": {
            "type": "string",
            "description": "Workspace ID (default: AIRBYTE_CLOUD_WORKSPACE_ID)",
        }
    }

    def _deploy_source(h, a):
        ws = _ws(h, a)
        src = ws.deploy_source(
            a["source_name"],
            {**(a.get("config") or {}), "sourceType": a["source_type"]},
            unique=bool(a.get("unique", True)),
        )
        return {"source_id": src.connector_id, "name": src.name}

    def _deploy_destination(h, a):
        ws = _ws(h, a)
        dest = ws.deploy_destination(
            a["destination_name"],
            {**(a.get("config") or {}), "destinationType": a["destination_type"]},
            unique=bool(a.get("unique", True)),
        )
        return {"destination_id": dest.connector_id, "name": dest.name}

    def _create_connection(h, a):
        ws = _ws(h, a)
        conn = ws.deploy_connection(
            a["connection_name"],
            source=a["source_id"],
            destination=a["destination_id"],
            selected_streams=list(a["selected_streams"]),
            table_prefix=a.get("table_prefix"),
        )
        return {"connection_id": conn.connection_id, "streams": conn.stream_names}

    def _run_sync(h, a):
        ws = _ws(h, a)
        result = ws.get_connection(a["connection_id"]).run_sync(
            wait=bool(a.get("wait", False)),
            wait_timeout=int(a.get("wait_timeout", 300)),
        )
        return {"job_id": result.job_id, "status": result.get_job_status()}

    def _sync_status(h, a):
        ws = _ws(h, a)
        result = ws.get_connection(a["connection_id"]).get_sync_result(
            int(a["job_id"])
        )
        return {
            "job_id": result.job_id,
            "status": result.get_job_status(),
            "records_synced": result.records_synced,
            "bytes_synced": result.bytes_synced,
        }

    def _describe_connection(h, a):
        ws = _ws(h, a)
        conn = ws.get_connection(a["connection_id"])
        return {
            "connection_id": conn.connection_id,
            "name": conn.name,
            "source_id": conn.source_id,
            "destination_id": conn.destination_id,
            "streams": conn.stream_names,
            "table_prefix": conn.table_prefix,
        }

    return [
        ToolDef(
            "check_cloud_workspace",
            "Verify hosted-workspace credentials by listing its connections.",
            {"type": "object", "properties": dict(ws_prop)},
            lambda h, a: {
                "workspace_id": _ws(h, a).workspace_id,
                "connections": len(_ws(h, a).list_connections()),
            },
        ),
        ToolDef(
            "deploy_source_to_cloud",
            "Deploy a source connector to the hosted workspace.",
            {
                "type": "object",
                "properties": {
                    **ws_prop,
                    "source_name": {"type": "string"},
                    "source_type": {
                        "type": "string",
                        "description": "Connector type, e.g. 'faker'",
                    },
                    "config": {"type": "object"},
                    "unique": {"type": "boolean", "default": True},
                },
                "required": ["source_name", "source_type"],
            },
            _deploy_source,
        ),
        ToolDef(
            "deploy_destination_to_cloud",
            "Deploy a destination connector to the hosted workspace.",
            {
                "type": "object",
                "properties": {
                    **ws_prop,
                    "destination_name": {"type": "string"},
                    "destination_type": {"type": "string"},
                    "config": {"type": "object"},
                    "unique": {"type": "boolean", "default": True},
                },
                "required": ["destination_name", "destination_type"],
            },
            _deploy_destination,
        ),
        ToolDef(
            "create_cloud_connection",
            "Connect a deployed source and destination with selected streams.",
            {
                "type": "object",
                "properties": {
                    **ws_prop,
                    "connection_name": {"type": "string"},
                    "source_id": {"type": "string"},
                    "destination_id": {"type": "string"},
                    "selected_streams": {
                        "type": "array",
                        "items": {"type": "string"},
                    },
                    "table_prefix": {"type": "string"},
                },
                "required": [
                    "connection_name",
                    "source_id",
                    "destination_id",
                    "selected_streams",
                ],
            },
            _create_connection,
        ),
        ToolDef(
            "run_cloud_sync",
            "Trigger a sync job on a connection; optionally wait for it.",
            {
                "type": "object",
                "properties": {
                    **ws_prop,
                    "connection_id": {"type": "string"},
                    "wait": {"type": "boolean", "default": False},
                    "wait_timeout": {"type": "integer", "default": 300},
                },
                "required": ["connection_id"],
            },
            _run_sync,
        ),
        ToolDef(
            "get_cloud_sync_status",
            "Status, records and bytes for one sync job.",
            {
                "type": "object",
                "properties": {
                    **ws_prop,
                    "connection_id": {"type": "string"},
                    "job_id": {"type": "integer"},
                },
                "required": ["connection_id", "job_id"],
            },
            _sync_status,
        ),
        ToolDef(
            "list_deployed_cloud_sources",
            "List sources deployed in the hosted workspace.",
            {"type": "object", "properties": dict(ws_prop)},
            lambda h, a: [
                {"source_id": s.connector_id, "name": s.name}
                for s in _ws(h, a).list_sources()
            ],
        ),
        ToolDef(
            "list_deployed_cloud_destinations",
            "List destinations deployed in the hosted workspace.",
            {"type": "object", "properties": dict(ws_prop)},
            lambda h, a: [
                {"destination_id": d.connector_id, "name": d.name}
                for d in _ws(h, a).list_destinations()
            ],
        ),
        ToolDef(
            "describe_cloud_connection",
            "Name, endpoints, streams and prefix of one connection.",
            {
                "type": "object",
                "properties": {**ws_prop, "connection_id": {"type": "string"}},
                "required": ["connection_id"],
            },
            _describe_connection,
        ),
    ]


TOOL_DEFS: list[ToolDef] = (
    _build_tool_defs() + _build_cloud_tool_defs() + _build_interactive_tool_defs()
)


# -- JSON-RPC / MCP loop -----------------------------------------------------


class McpStdioServer:
    """Newline-delimited JSON-RPC 2.0 loop implementing the MCP
    server handshake and tools surface."""

    def __init__(self, host: LocalToolHost | None = None) -> None:
        self.host = host or LocalToolHost()
        self.tools = {d.name: d for d in TOOL_DEFS}
        self.prompts = {p.name: p for p in PROMPT_DEFS}

    # request dispatch -------------------------------------------------------

    def handle(self, msg: dict) -> dict | None:
        """One message in, one response out (None for notifications)."""
        method = msg.get("method")
        msg_id = msg.get("id")
        is_notification = msg_id is None
        try:
            if method == "initialize":
                result = {
                    "protocolVersion": msg.get("params", {}).get(
                        "protocolVersion", PROTOCOL_VERSION
                    ),
                    "capabilities": {"tools": {}, "prompts": {}},
                    "serverInfo": SERVER_INFO,
                }
            elif method == "ping":
                result = {}
            elif method == "tools/list":
                result = {"tools": [d.to_listing() for d in self.tools.values()]}
            elif method == "tools/call":
                result = self._call_tool(msg.get("params") or {})
            elif method == "prompts/list":
                result = {
                    "prompts": [p.to_listing() for p in self.prompts.values()]
                }
            elif method == "prompts/get":
                result = self._get_prompt(msg.get("params") or {})
            elif method and method.startswith("notifications/"):
                return None
            else:
                if is_notification:
                    return None
                return _error(msg_id, -32601, f"method not found: {method}")
        except _InvalidParams as exc:
            return None if is_notification else _error(msg_id, -32602, str(exc))
        except Exception as exc:  # noqa: BLE001 - protocol boundary
            return None if is_notification else _error(msg_id, -32603, str(exc))
        return None if is_notification else {"jsonrpc": "2.0", "id": msg_id, "result": result}

    def _call_tool(self, params: dict) -> dict:
        name = params.get("name")
        tool = self.tools.get(name or "")
        if tool is None:
            raise _InvalidParams(f"unknown tool: {name}")
        args = params.get("arguments") or {}
        for req in tool.input_schema.get("required", []):
            if req not in args:
                raise _InvalidParams(f"missing required argument: {req}")
        try:
            out = tool.handler(self.host, args)
        except Exception as exc:  # noqa: BLE001 - MCP tool errors are results
            return {
                "content": [{"type": "text", "text": f"{type(exc).__name__}: {exc}"}],
                "isError": True,
            }
        if isinstance(out, dict) and "__mcp_content__" in out:
            # UI-presenting tools build their content blocks directly
            # (text summary + embedded HTML resource).
            return {"content": out["__mcp_content__"], "isError": False}
        return {
            "content": [{"type": "text", "text": json.dumps(out, default=str)}],
            "isError": False,
        }

    def _get_prompt(self, params: dict) -> dict:
        name = params.get("name")
        prompt = self.prompts.get(name or "")
        if prompt is None:
            raise _InvalidParams(f"unknown prompt: {name}")
        args = params.get("arguments") or {}
        for arg_name, _, required in prompt.arguments:
            if required and arg_name not in args:
                raise _InvalidParams(f"missing required argument: {arg_name}")
        return {
            "description": prompt.description,
            "messages": [
                {
                    "role": "user",
                    "content": {"type": "text", "text": prompt.render(args)},
                }
            ],
        }

    # transport --------------------------------------------------------------

    def serve(self, in_stream: IO[str], out_stream: IO[str]) -> None:
        """Blocking loop: one JSON message per line until EOF."""
        for line in in_stream:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
            except ValueError:
                _write(out_stream, _error(None, -32700, "parse error"))
                continue
            resp = self.handle(msg)
            if resp is not None:
                _write(out_stream, resp)


class _InvalidParams(ValueError):
    pass


def _error(msg_id: Any, code: int, message: str) -> dict:
    return {
        "jsonrpc": "2.0",
        "id": msg_id,
        "error": {"code": code, "message": message},
    }


def _write(stream: IO[str], obj: dict) -> None:
    stream.write(json.dumps(obj, default=str) + "\n")
    stream.flush()


def main(warehouse_dir: str | None = None) -> int:
    """``pyab mcp serve`` equivalent: serve MCP on stdio."""
    import sys

    McpStdioServer(LocalToolHost(warehouse_dir=warehouse_dir)).serve(
        sys.stdin, sys.stdout
    )
    return 0
