"""MCP Streamable-HTTP transport over the same tool surface.

The reference serves its FastMCP app over HTTP in
``airbyte/mcp/http_main.py:1-140`` (host/port CLI, streamable-http
transport). This module is the dependency-free equivalent: a stdlib
``http.server`` endpoint speaking the MCP Streamable HTTP transport
(single endpoint, JSON-RPC request per POST, ``application/json``
responses, ``Mcp-Session-Id`` header per the 2025-06-18 spec) that
dispatches into the exact same :class:`~pyairbyte_spark.mcp_server.
McpStdioServer` request handler the stdio transport uses — one protocol
brain, two transports.

Scope notes (spec-conformant minimal server):

- POST with a JSON-RPC *request* → 200 + ``application/json`` body.
- POST with a *notification* → 202 Accepted, empty body.
- GET (client asking to open a server-initiated SSE stream) → 405; this
  server never initiates messages, which the spec explicitly allows.
- ``initialize`` responses carry ``Mcp-Session-Id``; later requests
  presenting a stale/foreign session id get 404 so a client re-inits.
- DELETE terminates the session (200).
- JSON-RPC batch arrays → 400 (batching was removed in 2025-06-18).
"""

from __future__ import annotations

import json
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyairbyte_spark.mcp_server import LocalToolHost, McpStdioServer

DEFAULT_ENDPOINT = "/mcp"


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    server_version = "pyairbyte-spark-mcp/1.0"

    def log_message(self, *args) -> None:  # quiet: no per-request stderr
        pass

    # -- helpers -------------------------------------------------------------

    def _send(self, status: int, body: bytes = b"", content_type: str | None = None,
              extra_headers: dict[str, str] | None = None) -> None:
        self.send_response(status)
        if content_type:
            self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        for k, v in (extra_headers or {}).items():
            self.send_header(k, v)
        self.end_headers()
        if body:
            self.wfile.write(body)

    def _send_json(self, status: int, obj: dict, extra_headers: dict | None = None) -> None:
        self._send(
            status,
            json.dumps(obj, default=str).encode(),
            "application/json",
            extra_headers,
        )

    def _endpoint_ok(self) -> bool:
        if self.path.split("?", 1)[0].rstrip("/") != self.server.endpoint:
            self._send(404)
            return False
        return True

    def _session_ok(self) -> bool:
        claimed = self.headers.get("Mcp-Session-Id")
        if claimed is not None and claimed != self.server.session_id:
            # stale/foreign session: 404 tells the client to re-initialize
            self._send(404)
            return False
        return True

    # -- verbs ---------------------------------------------------------------

    def do_POST(self) -> None:  # noqa: N802 - http.server API
        if not self._endpoint_ok() or not self._session_ok():
            return
        try:
            length = int(self.headers.get("Content-Length") or 0)
            msg = json.loads(self.rfile.read(length))
        except (ValueError, TypeError):
            self._send_json(
                400,
                {
                    "jsonrpc": "2.0",
                    "id": None,
                    "error": {"code": -32700, "message": "parse error"},
                },
            )
            return
        if isinstance(msg, list):
            self._send_json(
                400,
                {
                    "jsonrpc": "2.0",
                    "id": None,
                    "error": {
                        "code": -32600,
                        "message": "JSON-RPC batching is not supported",
                    },
                },
            )
            return
        resp = self.server.mcp.handle(msg)
        if resp is None:  # notification (or response message): accept
            self._send(202)
            return
        headers = {}
        if msg.get("method") == "initialize":
            headers["Mcp-Session-Id"] = self.server.session_id
        self._send_json(200, resp, headers)

    def do_GET(self) -> None:  # noqa: N802
        if not self._endpoint_ok():
            return
        # No server-initiated stream to offer (the spec allows refusing).
        self._send(405, extra_headers={"Allow": "POST, DELETE"})

    def do_DELETE(self) -> None:  # noqa: N802
        if not self._endpoint_ok() or not self._session_ok():
            return
        self.server.session_id = uuid.uuid4().hex  # invalidate old id
        self._send(200)


class McpHttpServer(ThreadingHTTPServer):
    """Threaded HTTP server wrapping one :class:`McpStdioServer` brain.

    Thread-per-request is safe here: tool handlers are read-mostly and
    the underlying SparkSession is thread-safe for job submission; the
    LocalToolHost memoizes sources behind a plain dict (worst case a
    lost race re-resolves a source).
    """

    daemon_threads = True

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 0,
        *,
        tool_host: LocalToolHost | None = None,
        endpoint: str = DEFAULT_ENDPOINT,
    ) -> None:
        super().__init__((host, port), _Handler)
        self.mcp = McpStdioServer(tool_host)
        self.endpoint = endpoint.rstrip("/")
        self.session_id = uuid.uuid4().hex

    @property
    def url(self) -> str:
        h, p = self.server_address[0], self.server_address[1]
        return f"http://{h}:{p}{self.endpoint}"

    def serve_background(self) -> threading.Thread:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t


def main(
    host: str = "127.0.0.1",
    port: int = 8000,
    *,
    warehouse_dir: str | None = None,
) -> int:
    """``pyab mcp serve --http`` equivalent (reference
    ``mcp/http_main.py``: host/port flags → streamable-http app)."""
    server = McpHttpServer(
        host, port, tool_host=LocalToolHost(warehouse_dir=warehouse_dir)
    )
    print(f"MCP streamable-http endpoint: {server.url}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0
