"""In-process MCP client round-trip against the stdio server.

Drives the real protocol loop (initialize → tools/list → tools/call)
through StringIO pipes — the same bytes a real MCP host would send —
per reference ``airbyte/mcp/server.py`` + ``local.py`` tool surface.
"""

from __future__ import annotations

import io
import json

import pytest

from pyairbyte_spark.mcp_server import TOOL_DEFS, LocalToolHost, McpStdioServer


class _Client:
    """Tiny JSON-RPC client pumping one request through serve()."""

    def __init__(self, server: McpStdioServer) -> None:
        self.server = server
        self._id = 0

    def request(self, method: str, params: dict | None = None) -> dict:
        self._id += 1
        msg = {"jsonrpc": "2.0", "id": self._id, "method": method}
        if params is not None:
            msg["params"] = params
        out = io.StringIO()
        self.server.serve(io.StringIO(json.dumps(msg) + "\n"), out)
        return json.loads(out.getvalue())

    def notify(self, method: str) -> str:
        out = io.StringIO()
        self.server.serve(
            io.StringIO(json.dumps({"jsonrpc": "2.0", "method": method}) + "\n"), out
        )
        return out.getvalue()

    def call_tool(self, name: str, arguments: dict | None = None) -> dict:
        resp = self.request("tools/call", {"name": name, "arguments": arguments or {}})
        assert "result" in resp, resp
        return resp["result"]


@pytest.fixture()
def client(spark, tmp_path):
    from pyairbyte_spark.cache import SparkCache

    host = LocalToolHost(cache=SparkCache(spark, str(tmp_path / "wh")))
    return _Client(McpStdioServer(host))


def test_handshake_and_tool_listing(client):
    init = client.request("initialize", {"protocolVersion": "2025-06-18"})
    assert init["result"]["serverInfo"]["name"] == "pyairbyte-spark-mcp"
    assert "tools" in init["result"]["capabilities"]
    assert client.notify("notifications/initialized") == ""  # no response
    listed = client.request("tools/list")["result"]["tools"]
    names = {t["name"] for t in listed}
    assert names == {d.name for d in TOOL_DEFS}
    # The reference's 9 local tools, 1:1.
    assert {
        "validate_connector_config",
        "list_source_streams",
        "get_source_stream_json_schema",
        "read_source_stream_records",
        "get_stream_previews",
        "sync_source_to_cache",
        "list_cached_streams",
        "describe_default_cache",
        "run_sql_query",
    } <= names
    assert all(t["inputSchema"]["type"] == "object" for t in listed)


def test_source_tools_round_trip(client):
    streams = client.call_tool("list_source_streams", {"source": "faker"})
    assert not streams["isError"]
    assert set(json.loads(streams["content"][0]["text"])) == {
        "users",
        "products",
        "purchases",
    }
    schema = client.call_tool(
        "get_source_stream_json_schema",
        {"source": "faker", "stream_name": "users"},
    )
    props = json.loads(schema["content"][0]["text"])["properties"]
    assert "id" in props
    recs = client.call_tool(
        "read_source_stream_records",
        {"source": "faker", "stream_name": "users", "limit": 3},
    )
    assert len(json.loads(recs["content"][0]["text"])) == 3


def test_sync_then_sql_round_trip(client):
    synced = client.call_tool(
        "sync_source_to_cache", {"source": "faker", "streams": ["users"]}
    )
    counts = json.loads(synced["content"][0]["text"])
    assert counts["users"] > 0
    rows = client.call_tool(
        "run_sql_query", {"sql": "SELECT count(*) AS n FROM users"}
    )
    assert json.loads(rows["content"][0]["text"]) == [{"n": counts["users"]}]
    cached = client.call_tool("list_cached_streams")
    assert any(
        d["stream_name"] == "users"
        for d in json.loads(cached["content"][0]["text"])
    )


def test_tool_errors_are_results_not_crashes(client):
    # Guarded SQL rejection arrives as an isError tool result.
    res = client.call_tool("run_sql_query", {"sql": "DROP TABLE users"})
    assert res["isError"] and "UnsafeSQL" in res["content"][0]["text"]
    # Unknown tool → JSON-RPC invalid-params error.
    resp = client.request("tools/call", {"name": "nope", "arguments": {}})
    assert resp["error"]["code"] == -32602
    # Missing required argument → invalid params.
    resp = client.request(
        "tools/call", {"name": "run_sql_query", "arguments": {}}
    )
    assert resp["error"]["code"] == -32602
    # Unknown method → method not found.
    resp = client.request("bogus/method")
    assert resp["error"]["code"] == -32601
    # Parse error → -32700 with null id.
    out = io.StringIO()
    client.server.serve(io.StringIO("{not json\n"), out)
    assert json.loads(out.getvalue())["error"]["code"] == -32700


def test_registry_browse_tools(client):
    """Registry browse (reference mcp/registry.py): list with filters,
    then drill into one connector's info."""
    listed = client.call_tool("list_connectors", {})
    names = json.loads(listed["content"][0]["text"])
    assert "source-faker" in names and not listed["isError"]

    filtered = client.call_tool(
        "list_connectors",
        {"keyword_filter": "faker", "connector_type_filter": "source"},
    )
    assert json.loads(filtered["content"][0]["text"]) == [
        "source-e2e-test", "source-faker", "source-test",
    ] or "source-faker" in json.loads(filtered["content"][0]["text"])

    by_install = client.call_tool("list_connectors", {"install_types": ["python"]})
    assert "source-faker" in json.loads(by_install["content"][0]["text"])

    info = client.call_tool("get_connector_info", {"connector_name": "source-faker"})
    doc = json.loads(info["content"][0]["text"])
    assert doc["connector_name"] == "source-faker"
    assert "python" in doc["install_types"]
    assert doc["documentation_url"].endswith("/sources/faker")
    assert "manifest.yaml" in doc["manifest_url"]

    missing = client.call_tool(
        "get_connector_info", {"connector_name": "source-nope"}
    )
    assert json.loads(missing["content"][0]["text"]) == "Connector not found."


def test_prompts_surface(client):
    """prompts/list + prompts/get round-trip (reference mcp/prompts.py)."""
    init = client.request("initialize", {"protocolVersion": "2025-06-18"})
    assert "prompts" in init["result"]["capabilities"]

    listed = client.request("prompts/list")["result"]["prompts"]
    names = {p["name"] for p in listed}
    assert {"test-my-tools", "explore-a-source"} <= names
    assert all("description" in p and "arguments" in p for p in listed)

    got = client.request(
        "prompts/get",
        {"name": "test-my-tools", "arguments": {"scope": "only read-only tools"}},
    )["result"]
    text = got["messages"][0]["content"]["text"]
    assert "only read-only tools" in text and got["messages"][0]["role"] == "user"

    got2 = client.request(
        "prompts/get", {"name": "explore-a-source", "arguments": {"source": "faker"}}
    )["result"]
    assert "'faker'" in got2["messages"][0]["content"]["text"]

    bad = client.request("prompts/get", {"name": "no-such-prompt"})
    assert bad["error"]["code"] == -32602


def test_cloud_tools_full_lifecycle(spark, tmp_path):
    """Cloud tools over an injected fake workspace: deploy source +
    destination, connect, sync, poll — all through the MCP wire."""
    from pyairbyte_spark.cache import SparkCache
    from pyairbyte_spark.cloud import CloudWorkspace, FakeCloudTransport

    transport = FakeCloudTransport()
    host = LocalToolHost(
        cache=SparkCache(spark, str(tmp_path / "wh")),
        cloud_workspace=CloudWorkspace(workspace_id="ws-1", transport=transport),
    )
    client = _Client(McpStdioServer(host))

    src = json.loads(
        client.call_tool(
            "deploy_source_to_cloud",
            {"source_name": "mcp faker", "source_type": "faker", "config": {"count": 5}},
        )["content"][0]["text"]
    )
    dest = json.loads(
        client.call_tool(
            "deploy_destination_to_cloud",
            {"destination_name": "mcp wh", "destination_type": "spark"},
        )["content"][0]["text"]
    )
    conn = json.loads(
        client.call_tool(
            "create_cloud_connection",
            {
                "connection_name": "mcp conn",
                "source_id": src["source_id"],
                "destination_id": dest["destination_id"],
                "selected_streams": ["users"],
            },
        )["content"][0]["text"]
    )
    assert conn["streams"] == ["users"]

    run = json.loads(
        client.call_tool("run_cloud_sync", {"connection_id": conn["connection_id"]})[
            "content"
        ][0]["text"]
    )
    assert run["status"] == "running"
    transport.jobs[run["job_id"]].update(status="succeeded", rowsSynced=5)
    status = json.loads(
        client.call_tool(
            "get_cloud_sync_status",
            {"connection_id": conn["connection_id"], "job_id": run["job_id"]},
        )["content"][0]["text"]
    )
    assert status["status"] == "succeeded" and status["records_synced"] == 5

    listed = json.loads(
        client.call_tool("list_deployed_cloud_sources", {})["content"][0]["text"]
    )
    assert listed == [{"source_id": src["source_id"], "name": "mcp faker"}]
    desc = json.loads(
        client.call_tool(
            "describe_cloud_connection", {"connection_id": conn["connection_id"]}
        )["content"][0]["text"]
    )
    assert desc["source_id"] == src["source_id"]
    check = json.loads(
        client.call_tool("check_cloud_workspace", {})["content"][0]["text"]
    )
    assert check == {"workspace_id": "ws-1", "connections": 1}


def test_interactive_ui_tools(spark, tmp_path):
    """UI-presenting tools return a text summary plus an embedded HTML
    resource (reference mcp/interactive/)."""
    from pyairbyte_spark.cache import SparkCache
    from pyairbyte_spark.cloud import CloudWorkspace, FakeCloudTransport

    transport = FakeCloudTransport()
    transport.connections["c-1"] = {
        "connectionId": "c-1",
        "name": "nightly sync",
        "sourceId": "s",
        "destinationId": "d",
    }
    transport.jobs[1] = {
        "jobId": 1, "connectionId": "c-1", "status": "succeeded",
        "rowsSynced": 42, "bytesSynced": 1024,
    }
    transport.jobs[2] = {
        "jobId": 2, "connectionId": "c-1", "status": "running",
        "rowsSynced": 0, "bytesSynced": 0,
    }
    host = LocalToolHost(
        cache=SparkCache(spark, str(tmp_path / "wh")),
        cloud_workspace=CloudWorkspace(workspace_id="ws-1", transport=transport),
    )
    client = _Client(McpStdioServer(host))

    out = client.call_tool("show_connectors_list", {"keyword_filter": "faker"})
    text, resource = out["content"]
    assert "connectors" in text["text"]
    assert resource["type"] == "resource"
    assert resource["resource"]["mimeType"] == "text/html"
    assert "source-faker" in resource["resource"]["text"]

    hist = client.call_tool(
        "show_connection_sync_history", {"connection_id": "c-1"}
    )
    html = hist["content"][1]["resource"]["text"]
    assert "succeeded" in html and "42" in html
    # newest job first
    assert html.index("running") < html.index("succeeded")

    status = client.call_tool("show_workspace_sync_status", {})
    html = status["content"][1]["resource"]["text"]
    assert "nightly sync" in html and "running" in html


def test_cloud_tools_unconfigured_error(client):
    """Without credentials or an injected workspace, cloud tools fail as
    tool-results (isError), not server crashes."""
    out = client.call_tool("check_cloud_workspace", {})
    assert out["isError"]
    assert "not configured" in out["content"][0]["text"]


def test_cli_mcp_subcommand_serves_stdio(tmp_path):
    """End-to-end through the installed CLI: pipe a handshake into
    `pyab-spark mcp` and read the responses back (no Spark needed for
    list-only traffic)."""
    import subprocess
    import sys

    inp = "\n".join(
        [
            json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}}),
            json.dumps({"jsonrpc": "2.0", "method": "notifications/initialized"}),
            json.dumps({"jsonrpc": "2.0", "id": 2, "method": "tools/list"}),
        ]
    )
    proc = subprocess.run(
        [sys.executable, "-m", "pyairbyte_spark.cli", "mcp"],
        input=inp + "\n",
        capture_output=True,
        text=True,
        timeout=120,
        cwd="/root/repo",
    )
    lines = [json.loads(ln) for ln in proc.stdout.splitlines() if ln.strip()]
    assert lines[0]["result"]["serverInfo"]["name"] == "pyairbyte-spark-mcp"
    assert len(lines) == 2  # notification produced no response
    assert {t["name"] for t in lines[1]["result"]["tools"]} >= {"run_sql_query"}


def test_argv_spec_resolution_keeps_config(tmp_path):
    """Config supplied with an argv-string source spec must reach the
    connector (previously only the faker/fixture/manifest branch merged
    it; argv specs silently ran with empty config)."""
    script = tmp_path / "c.py"
    script.write_text("print('noop')\n")
    src = LocalToolHost._default_resolve(f"python {script}", {"api_key": "k-1"})
    assert src.config.get("api_key") == "k-1"


def test_acid_maintenance_tools(spark, tmp_path):
    """history → changes → compact → vacuum over MCP, against a
    commit-log cache; plain caches get a structured error."""
    import json as _json

    from pyspark.sql import functions as F

    from pyairbyte_spark.cache import SparkCache

    cache = SparkCache(
        spark, warehouse_dir=str(tmp_path / "wh"), table_format="commitlog"
    )
    tname = cache.table_name("users")
    df = (
        spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
        .withColumn("_airbyte_raw_id", F.col("id").cast("string"))
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
    )
    cache.store.write_merge(df, tname, ["id"])
    upd = (
        spark.createDataFrame([(1, "a2")], ["id", "v"])
        .withColumn("_airbyte_raw_id", F.lit("z1"))
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
    )
    cache.store.write_merge(upd, tname, ["id"])

    client = _Client(McpStdioServer(LocalToolHost(cache=cache)))

    hist = _json.loads(
        client.call_tool("get_table_history", {"stream_name": "users"})["content"][0]["text"]
    )
    assert [h["version"] for h in hist] == [2, 1]

    changes = _json.loads(
        client.call_tool(
            "read_table_changes", {"stream_name": "users", "from_version": 1}
        )["content"][0]["text"]
    )
    assert [(c["_change_type"], c["id"], c["v"]) for c in changes] == [
        ("update_postimage", 1, "a2")
    ]

    res = _json.loads(
        client.call_tool(
            "compact_table", {"stream_name": "users", "sort_by": ["id"]}
        )["content"][0]["text"]
    )
    assert res["compacted"] is True

    vac = _json.loads(
        client.call_tool("vacuum_table", {"stream_name": "users"})["content"][0]["text"]
    )
    assert isinstance(vac["removed_dirs"], list) and vac["removed_dirs"]

    # plain parquet cache → error result, not a crash
    plain = _Client(
        McpStdioServer(
            LocalToolHost(cache=SparkCache(spark, str(tmp_path / "plain")))
        )
    )
    out = plain.call_tool("get_table_history", {"stream_name": "users"})
    assert out.get("isError")


def test_delete_table_rows_tool(spark, tmp_path):
    import json as _json

    from pyspark.sql import functions as F

    from pyairbyte_spark.cache import SparkCache

    cache = SparkCache(
        spark, warehouse_dir=str(tmp_path / "wh"), table_format="commitlog"
    )
    df = (
        spark.range(20)
        .toDF("id")
        .withColumn("_airbyte_raw_id", F.col("id").cast("string"))
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
    )
    cache.store.write_append(df.coalesce(1), cache.table_name("users"))
    client = _Client(McpStdioServer(LocalToolHost(cache=cache)))
    out = _json.loads(
        client.call_tool(
            "delete_table_rows",
            {"stream_name": "users", "predicates": [["id", ">=", 15]]},
        )["content"][0]["text"]
    )
    assert out["deleted_rows"] == 5
    assert cache.store.read(cache.table_name("users")).count() == 15


def test_update_table_rows_tool(spark, tmp_path):
    import json as _json

    from pyspark.sql import functions as F

    from pyairbyte_spark.cache import SparkCache

    cache = SparkCache(
        spark, warehouse_dir=str(tmp_path / "wh"), table_format="commitlog"
    )
    df = (
        spark.range(10)
        .toDF("id")
        .withColumn("status", F.lit("new"))
        .withColumn("_airbyte_raw_id", F.col("id").cast("string"))
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
    )
    cache.store.write_append(df.coalesce(1), cache.table_name("users"))
    client = _Client(McpStdioServer(LocalToolHost(cache=cache)))
    out = _json.loads(
        client.call_tool(
            "update_table_rows",
            {
                "stream_name": "users",
                "predicates": [["id", "<", 3]],
                "assignments": {"status": "'done'"},
            },
        )["content"][0]["text"]
    )
    assert out["updated_rows"] == 3
    got = cache.store.read(cache.table_name("users"))
    assert got.filter(F.col("status") == "done").count() == 3


def test_schema_ddl_tools(spark, tmp_path):
    import json as _json

    from pyspark.sql import functions as F

    from pyairbyte_spark.cache import SparkCache

    cache = SparkCache(
        spark, warehouse_dir=str(tmp_path / "wh"), table_format="commitlog"
    )
    df = (
        spark.range(5)
        .toDF("id")
        .withColumn("v", F.lit("x"))
        .withColumn("secret", F.lit(1))
        .withColumn("_airbyte_raw_id", F.col("id").cast("string"))
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
    )
    cache.store.write_append(df.coalesce(1), cache.table_name("users"))
    client = _Client(McpStdioServer(LocalToolHost(cache=cache)))
    out = _json.loads(
        client.call_tool(
            "rename_table_column",
            {"stream_name": "users", "old": "v", "new": "text"},
        )["content"][0]["text"]
    )
    assert out["version"] == 2
    out = _json.loads(
        client.call_tool(
            "drop_table_column", {"stream_name": "users", "column": "secret"}
        )["content"][0]["text"]
    )
    assert out["version"] == 3
    cols = cache.store.read(cache.table_name("users")).columns
    assert "text" in cols and "v" not in cols and "secret" not in cols


def test_table_check_tools(spark, tmp_path):
    """set/get/drop persisted CHECK constraints through the MCP
    surface, and a violating write failing under the constraint."""
    import json as _json

    import pytest as _pytest
    from pyspark.sql import functions as F

    from pyairbyte_spark.cache import SparkCache
    from pyairbyte_spark.expectations import ExpectationViolation

    cache = SparkCache(
        spark, warehouse_dir=str(tmp_path / "wh"), table_format="commitlog"
    )
    df = (
        spark.range(1, 11)
        .toDF("id")
        .withColumn("_airbyte_raw_id", F.col("id").cast("string"))
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
    )
    cache.store.write_append(df.coalesce(1), cache.table_name("users"))
    client = _Client(McpStdioServer(LocalToolHost(cache=cache)))
    out = _json.loads(
        client.call_tool(
            "set_table_check",
            {"stream_name": "users", "name": "id_pos", "expr": "id > 0"},
        )["content"][0]["text"]
    )
    assert out["version"] == 2
    checks = _json.loads(
        client.call_tool("get_table_checks", {"stream_name": "users"})[
            "content"
        ][0]["text"]
    )
    assert checks == {"id_pos": "id > 0"}
    # the constraint is live: a violating write fails
    bad = (
        spark.range(-3, -1)
        .toDF("id")
        .withColumn("_airbyte_raw_id", F.col("id").cast("string"))
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
    )
    with _pytest.raises(ExpectationViolation):
        cache.store.write_append(bad.coalesce(1), cache.table_name("users"))
    # adding a check current data violates surfaces as a tool error
    res = client.call_tool(
        "set_table_check",
        {"stream_name": "users", "name": "big", "expr": "id > 100"},
    )
    assert res.get("isError")
    out = _json.loads(
        client.call_tool(
            "drop_table_check", {"stream_name": "users", "name": "id_pos"}
        )["content"][0]["text"]
    )
    assert out["version"] == 3
    checks = _json.loads(
        client.call_tool("get_table_checks", {"stream_name": "users"})[
            "content"
        ][0]["text"]
    )
    assert checks == {}


def test_restore_table_tool(spark, tmp_path):
    import json as _json

    from pyspark.sql import functions as F

    from pyairbyte_spark.cache import SparkCache

    cache = SparkCache(
        spark, warehouse_dir=str(tmp_path / "wh"), table_format="commitlog"
    )

    def _d(lo, hi, p):
        return (
            spark.range(lo, hi)
            .toDF("id")
            .withColumn("_airbyte_raw_id", F.concat(F.lit(p), F.col("id")))
            .withColumn("_airbyte_extracted_at", F.current_timestamp())
        )

    t_name = cache.table_name("users")
    cache.store.write_replace(_d(0, 5, "a"), t_name)
    cache.store.write_replace(_d(0, 2, "b"), t_name)
    client = _Client(McpStdioServer(LocalToolHost(cache=cache)))
    out = _json.loads(
        client.call_tool(
            "restore_table", {"stream_name": "users", "version": 1}
        )["content"][0]["text"]
    )
    assert out["version"] == 3
    assert cache.store.read(t_name).count() == 5


def test_ndv_tools(spark, tmp_path):
    """analyze_table_ndv + get_table_ndv through the MCP surface:
    analyze at v1, append v2, the served estimate reflects BOTH
    versions (change-feed catch-up) without a re-analyze."""
    import json as _json

    from pyspark.sql import functions as F

    from pyairbyte_spark.cache import SparkCache

    cache = SparkCache(
        spark, warehouse_dir=str(tmp_path / "wh"), table_format="commitlog"
    )
    df = (
        spark.range(500)
        .toDF("id")
        .withColumn("grp", (F.col("id") % 4).cast("string"))
        .withColumn("_airbyte_raw_id", F.col("id").cast("string"))
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
    )
    tname = cache.table_name("users")
    cache.store.write_append(df.filter("id < 250").coalesce(1), tname)
    client = _Client(McpStdioServer(LocalToolHost(cache=cache)))
    out = _json.loads(
        client.call_tool(
            "analyze_table_ndv",
            {"stream_name": "users", "columns": ["id", "grp"]},
        )["content"][0]["text"]
    )
    assert out["columns"] == ["grp", "id"]
    cache.store.write_append(df.filter("id >= 250").coalesce(1), tname)
    est = _json.loads(
        client.call_tool("get_table_ndv", {"stream_name": "users"})[
            "content"
        ][0]["text"]
    )
    assert est["grp"] == 4
    # ~500 ids through a 256-register sketch: within 5 sigma
    assert abs(est["id"] - 500) / 500 <= 5 * 1.04 / 16


def test_profile_table_tool(spark, tmp_path):
    import json as _json

    from pyspark.sql import functions as F

    from pyairbyte_spark.cache import SparkCache

    cache = SparkCache(spark, warehouse_dir=str(tmp_path / "wh"))
    df = (
        spark.range(100)
        .toDF("id")
        .withColumn("grp", (F.col("id") % 3).cast("string"))
        .withColumn(
            "grp",
            F.when(F.col("id") < 10, F.lit(None)).otherwise(F.col("grp")),
        )
        .withColumn("_airbyte_raw_id", F.col("id").cast("string"))
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
    )
    cache.store.write_append(df.coalesce(1), cache.table_name("users"))
    client = _Client(McpStdioServer(LocalToolHost(cache=cache)))
    out = _json.loads(
        client.call_tool("profile_table", {"stream_name": "users"})[
            "content"
        ][0]["text"]
    )
    prof = {r["column"]: r for r in out}
    assert prof["id"]["n_rows"] == 100 and prof["id"]["n_nulls"] == 0
    assert prof["grp"]["n_nulls"] == 10
    assert prof["grp"]["approx_distinct"] == 3
    assert prof["id"]["min_str"] == "0" and prof["id"]["max_str"] == "99"


def test_vector_search_tool(spark, tmp_path):
    """vector_search_table: exact cosine top-k over an embedding
    column through the MCP protocol loop."""
    import json as _json

    from pyspark.sql import functions as F

    from pyairbyte_spark.cache import SparkCache

    cache = SparkCache(spark, str(tmp_path / "vs"))
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = emb.withColumn(
        "_airbyte_raw_id", F.col("vec_id").cast("string")
    ).withColumn("_airbyte_extracted_at", F.current_timestamp())
    cache.store.write_append(df.coalesce(1), cache.table_name("vecs"))
    client = _Client(McpStdioServer(LocalToolHost(cache=cache)))
    out = _json.loads(
        client.call_tool(
            "vector_search_table",
            {"stream_name": "vecs", "query_id": 0, "k": 3},
        )["content"][0]["text"]
    )
    assert len(out) == 3
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert all(r["neighbor_id"] != 0 for r in out)
    assert out[0]["cosine"] >= out[1]["cosine"] >= out[2]["cosine"]


def test_clone_table_tool(spark, tmp_path):
    import json as _json

    from pyspark.sql import functions as F

    from pyairbyte_spark.cache import SparkCache

    cache = SparkCache(spark, str(tmp_path / "ct"), table_format="commitlog")
    df = (
        spark.range(0, 20)
        .withColumn("_airbyte_raw_id", F.col("id").cast("string"))
        .withColumn("_airbyte_extracted_at", F.current_timestamp())
    )
    cache.store.write_append(df.coalesce(1), cache.table_name("users"))
    client = _Client(McpStdioServer(LocalToolHost(cache=cache)))
    out = _json.loads(
        client.call_tool(
            "clone_table",
            {"source_stream": "users", "dest_stream": "users_dev"},
        )["content"][0]["text"]
    )
    assert out == {"cloned": "users_dev", "from": "users", "version": 1}
    assert len(cache["users_dev"]) == 20
