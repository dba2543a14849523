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
    ) -> None:
        self._warehouse_dir = warehouse_dir
        self._cache = cache
        self._source_resolver = source_resolver
        self._sources: dict[str, Any] = {}

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
    ]


TOOL_DEFS: list[ToolDef] = _build_tool_defs()


# -- JSON-RPC / MCP loop -----------------------------------------------------


class McpStdioServer:
    """Newline-delimited JSON-RPC 2.0 loop implementing the MCP
    server handshake and tools surface."""

    def __init__(self, host: LocalToolHost | None = None) -> None:
        self.host = host or LocalToolHost()
        self.tools = {d.name: d for d in TOOL_DEFS}

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
                    "capabilities": {"tools": {}},
                    "serverInfo": SERVER_INFO,
                }
            elif method == "ping":
                result = {}
            elif method == "tools/list":
                result = {"tools": [d.to_listing() for d in self.tools.values()]}
            elif method == "tools/call":
                result = self._call_tool(msg.get("params") or {})
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
        return {
            "content": [{"type": "text", "text": json.dumps(out, default=str)}],
            "isError": False,
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
