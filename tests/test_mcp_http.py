"""MCP Streamable-HTTP transport: real-socket round trip.

Drives initialize → tools/list → tools/call through an actual HTTP
connection against :class:`McpHttpServer` (reference parity:
``airbyte/mcp/http_main.py`` serves the same tool surface over HTTP).
"""

from __future__ import annotations

import http.client
import json

import pytest

from pyairbyte_spark.mcp_http import McpHttpServer
from pyairbyte_spark.mcp_server import LocalToolHost


@pytest.fixture()
def server(spark, tmp_path):
    from pyairbyte_spark.cache import SparkCache

    host = LocalToolHost(cache=SparkCache(spark, str(tmp_path / "wh")))
    srv = McpHttpServer(tool_host=host)  # port 0: OS-assigned
    srv.serve_background()
    yield srv
    srv.shutdown()
    srv.server_close()


class _HttpClient:
    def __init__(self, srv: McpHttpServer) -> None:
        self.addr = srv.server_address
        self.session_id: str | None = None
        self._id = 0

    def post(self, payload, path="/mcp", headers=None):
        conn = http.client.HTTPConnection(*self.addr, timeout=30)
        try:
            hdrs = {"Content-Type": "application/json"}
            if self.session_id:
                hdrs["Mcp-Session-Id"] = self.session_id
            hdrs.update(headers or {})
            body = payload if isinstance(payload, (str, bytes)) else json.dumps(payload)
            conn.request("POST", path, body=body, headers=hdrs)
            resp = conn.getresponse()
            data = resp.read()
            return resp, data
        finally:
            conn.close()

    def request(self, method: str, params: dict | None = None):
        self._id += 1
        msg = {"jsonrpc": "2.0", "id": self._id, "method": method}
        if params is not None:
            msg["params"] = params
        resp, data = self.post(msg)
        if method == "initialize":
            self.session_id = resp.getheader("Mcp-Session-Id")
        assert resp.status == 200, (resp.status, data)
        return json.loads(data)


def test_http_handshake_list_and_call(server):
    client = _HttpClient(server)
    init = client.request("initialize", {"protocolVersion": "2025-06-18"})
    assert init["result"]["serverInfo"]["name"] == "pyairbyte-spark-mcp"
    assert client.session_id  # server assigned a session

    # notification -> 202 Accepted, no body
    resp, data = client.post(
        {"jsonrpc": "2.0", "method": "notifications/initialized"}
    )
    assert resp.status == 202 and data == b""

    tools = client.request("tools/list")["result"]["tools"]
    assert {"run_sql_query", "sync_source_to_cache"} <= {t["name"] for t in tools}

    # real tool call over the socket (source-only: no Spark startup cost)
    result = client.request(
        "tools/call",
        {"name": "list_source_streams", "arguments": {"source": "faker"}},
    )["result"]
    assert not result["isError"]
    streams = json.loads(result["content"][0]["text"])
    assert "users" in json.dumps(streams)


def test_http_transport_edges(server):
    client = _HttpClient(server)
    client.request("initialize", {"protocolVersion": "2025-06-18"})

    # wrong endpoint -> 404
    resp, _ = client.post({"jsonrpc": "2.0", "id": 1, "method": "ping"}, path="/nope")
    assert resp.status == 404

    # malformed JSON -> 400 + JSON-RPC parse error
    resp, data = client.post("{not json", path="/mcp")
    assert resp.status == 400
    assert json.loads(data)["error"]["code"] == -32700

    # batch arrays were removed from the protocol -> 400
    resp, data = client.post([{"jsonrpc": "2.0", "id": 1, "method": "ping"}])
    assert resp.status == 400
    assert json.loads(data)["error"]["code"] == -32600

    # GET (SSE stream request) is refused: this server never pushes
    import urllib.request

    req = urllib.request.Request(f"http://{server.server_address[0]}:{server.server_address[1]}/mcp")
    try:
        urllib.request.urlopen(req, timeout=30)
        raise AssertionError("GET should not succeed")
    except urllib.error.HTTPError as e:
        assert e.code == 405

    # foreign session id -> 404 (client must re-initialize)
    resp, _ = client.post(
        {"jsonrpc": "2.0", "id": 9, "method": "ping"},
        headers={"Mcp-Session-Id": "stale-session"},
    )
    assert resp.status == 404

    # DELETE terminates the session; the old id stops working
    conn = http.client.HTTPConnection(*server.server_address, timeout=30)
    conn.request("DELETE", "/mcp", headers={"Mcp-Session-Id": client.session_id})
    assert conn.getresponse().status == 200
    conn.close()
    resp, _ = client.post({"jsonrpc": "2.0", "id": 10, "method": "ping"})
    assert resp.status == 404


def test_http_and_stdio_share_one_brain(server):
    """The HTTP transport must expose exactly the stdio server's tools."""
    from pyairbyte_spark.mcp_server import TOOL_DEFS

    client = _HttpClient(server)
    client.request("initialize", {"protocolVersion": "2025-06-18"})
    listed = {t["name"] for t in client.request("tools/list")["result"]["tools"]}
    assert listed == {d.name for d in TOOL_DEFS}
