"""Cloud API seam (S17): workspace/connection/sync-result object model
against a file-backed fake transport, plus the stdlib HTTP transport
against a local fixture server."""

from __future__ import annotations

import json
import threading

import pytest

from pyairbyte_spark.cloud import (
    CloudConnection,
    CloudWorkspace,
    ConnectionSyncError,
    ConnectionSyncTimeoutError,
    FakeCloudTransport,
    HttpTransport,
    SyncResult,
)


@pytest.fixture()
def seeded(spark, tmp_path):
    """A fake workspace whose destination points at a real Spark
    warehouse with synced data in it."""
    from pyairbyte_spark.cache import SparkCache
    from pyairbyte_spark.sources import SourceFaker

    wh = tmp_path / "dest_wh"
    cache = SparkCache(spark, str(wh))
    SourceFaker(seed=7, count=50).read(cache, write_strategy="auto")

    transport = FakeCloudTransport()
    transport.connections["conn-1"] = {
        "connectionId": "conn-1",
        "name": "faker to spark",
        "sourceId": "src-1",
        "destinationId": "dest-1",
        "prefix": "",
        "configurations": {"streams": [{"name": "users"}, {"name": "products"}]},
    }
    transport.destinations["dest-1"] = {
        "destinationId": "dest-1",
        "configuration": {"warehouse_dir": str(wh)},
    }
    return CloudWorkspace(workspace_id="ws-1", transport=transport), transport


def test_workspace_connection_metadata(seeded):
    ws, _ = seeded
    conn = ws.get_connection("conn-1")
    assert conn.name == "faker to spark"
    assert conn.source_id == "src-1" and conn.destination_id == "dest-1"
    assert conn.stream_names == ["users", "products"]
    listed = ws.list_connections()
    assert [c.connection_id for c in listed] == ["conn-1"]


def test_run_sync_polls_to_completion(seeded):
    ws, transport = seeded
    conn = ws.get_connection("conn-1")
    result = conn.run_sync()
    assert not result.is_job_complete()
    # Job finishes between polls.
    transport.jobs[result.job_id].update(
        status="succeeded", rowsSynced=50, bytesSynced=4096
    )
    result._sleep = lambda s: None
    assert result.wait_for_completion(raise_failure=True) == "succeeded"
    assert result.records_synced == 50 and result.bytes_synced == 4096
    # Final status is cached — no further HTTP polls.
    polls_before = len(transport.calls)
    assert result.get_job_status() == "succeeded"
    assert len(transport.calls) == polls_before


def test_failed_sync_raises(seeded):
    ws, transport = seeded
    result = ws.get_connection("conn-1").run_sync()
    transport.jobs[result.job_id]["status"] = "failed"
    with pytest.raises(ConnectionSyncError):
        result.wait_for_completion(raise_failure=True)


def test_wait_timeout(seeded):
    ws, _ = seeded
    result = ws.get_connection("conn-1").run_sync()
    result._sleep = lambda s: None
    with pytest.raises(ConnectionSyncTimeoutError):
        result.wait_for_completion(wait_timeout=-1)


def test_sync_result_dataset_surface(seeded):
    """The reference's SyncResult.get_sql_cache() → get_dataset seam:
    the destination config opens as a SparkCache and streams come back
    as CachedDatasets (sync_results.py:421-447)."""
    from pyairbyte_spark.datasets import CachedDataset

    ws, transport = seeded
    result = ws.get_connection("conn-1").get_sync_result(job_id=1)
    transport.jobs[1] = {"jobId": 1, "status": "succeeded"}
    ds = result.get_dataset("users")
    assert isinstance(ds, CachedDataset)
    assert len(ds) == 50
    assert result.get_sql_table_name("users") == "users"
    assert set(result.streams) >= {"users", "products", "purchases"}
    pdf = ds.to_pandas()
    assert len(pdf) == 50


def test_http_transport_round_trip():
    """HttpTransport against a local fixture server: headers, method,
    body and JSON decode."""
    import http.server

    seen = {}

    class Handler(http.server.BaseHTTPRequestHandler):
        def _reply(self, doc):
            body = json.dumps(doc).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            seen["auth"] = self.headers.get("Authorization")
            self._reply({"jobId": 5, "status": "succeeded"})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            seen["post_body"] = json.loads(self.rfile.read(n))
            self._reply({"jobId": 6, "status": "running"})

        def log_message(self, *a):
            pass

    server = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        root = f"http://127.0.0.1:{server.server_port}/v1"
        tr = HttpTransport(api_root=root, bearer_token="tok-1")
        doc = tr.request("GET", "/jobs/5")
        assert doc == {"jobId": 5, "status": "succeeded"}
        assert seen["auth"] == "Bearer tok-1"
        doc = tr.request("POST", "/jobs", {"connectionId": "c", "jobType": "sync"})
        assert doc["status"] == "running"
        assert seen["post_body"]["jobType"] == "sync"
        # The object model runs unchanged over the HTTP transport.
        ws = CloudWorkspace(workspace_id="w", transport=tr)
        res = SyncResult(
            workspace=ws,
            connection=CloudConnection(workspace=ws, connection_id="c"),
            job_id=5,
        )
        assert res.get_job_status() == "succeeded"
    finally:
        server.shutdown()


# -- management surface (deploy / list / check / delete) ---------------------


@pytest.fixture()
def ws():
    transport = FakeCloudTransport()
    return CloudWorkspace(workspace_id="ws-1", transport=transport), transport


def test_deploy_list_delete_roundtrip(ws):
    from pyairbyte_spark import exceptions as exc
    from pyairbyte_spark.sources import SourceFaker

    workspace, transport = ws
    src = workspace.deploy_source("deleteme faker", SourceFaker(seed=1, count=5))
    assert src.name == "deleteme faker"
    assert src.configuration["sourceType"] == "faker"
    dest = workspace.deploy_destination(
        "deleteme wh", {"destinationType": "spark", "warehouse_dir": "/tmp/wh"}
    )
    assert [s.connector_id for s in workspace.list_sources()] == [src.connector_id]
    assert [d.name for d in workspace.list_destinations()] == ["deleteme wh"]

    # unique=True rejects duplicate names
    with pytest.raises(exc.AirbyteDuplicateResourcesError):
        workspace.deploy_source("deleteme faker", SourceFaker(seed=1, count=5))
    # random_name_suffix sidesteps it
    src2 = workspace.deploy_source(
        "deleteme faker", SourceFaker(seed=2, count=5), random_name_suffix=True
    )
    assert src2.name != "deleteme faker"

    conn = workspace.deploy_connection(
        "deleteme conn",
        source=src,
        destination=dest,
        selected_streams=["users"],
        table_prefix="p_",
    )
    assert conn.stream_names == ["users"]
    assert conn.table_prefix == "p_"
    assert conn.source_id == src.connector_id

    # cascade delete tears everything down
    workspace.permanently_delete_connection(
        conn, cascade_delete_source=True, cascade_delete_destination=True
    )
    assert not transport.connections
    assert src.connector_id not in transport.sources
    assert dest.connector_id not in transport.destinations
    workspace.permanently_delete_source(src2)
    assert not transport.sources


def test_safe_mode_blocks_deletion(ws):
    from pyairbyte_spark import exceptions as exc
    from pyairbyte_spark.sources import SourceFaker

    workspace, transport = ws
    src = workspace.deploy_source("production faker", SourceFaker(seed=1, count=5))
    with pytest.raises(exc.PyAirbyteInputError):
        workspace.permanently_delete_source(src)
    assert src.connector_id in transport.sources  # still there
    workspace.permanently_delete_source(src, safe_mode=False)
    assert not transport.sources


def test_connection_requires_streams(ws):
    from pyairbyte_spark import exceptions as exc

    workspace, _ = ws
    with pytest.raises(exc.PyAirbyteInputError):
        workspace.deploy_connection(
            "c", source="s-1", destination="d-1", selected_streams=[]
        )


def test_deploy_dict_requires_type_key(ws):
    from pyairbyte_spark import exceptions as exc

    workspace, _ = ws
    with pytest.raises(exc.PyAirbyteInputError):
        workspace.deploy_destination("d", {"warehouse_dir": "/tmp/x"})
    with pytest.raises(exc.PyAirbyteInputError):
        workspace.deploy_source("s", {"count": 5})


def test_connector_check_rename_update(ws):
    from pyairbyte_spark.cloud import CloudError

    workspace, transport = ws
    src = workspace.deploy_source(
        "deleteme s", {"sourceType": "faker", "count": 5}
    )
    assert src.check()  # default: succeeds, truthy CheckResult
    transport.check_failures[src.connector_id] = "bad credentials"
    result = src.check(raise_on_error=False)
    assert not result and result.error_message == "bad credentials"
    with pytest.raises(CloudError):
        src.check()

    src.rename("deleteme s2")
    assert src.name == "deleteme s2"
    src.update_config({"count": 9})
    assert src.configuration == {"sourceType": "faker", "count": 9}
    # name-filtered listing
    assert workspace.list_sources(name="deleteme s2")
    assert not workspace.list_sources(name="deleteme s")
    assert workspace.list_sources(name_filter=lambda n: "s2" in n, limit=1)


def test_from_env_bearer_and_client_credentials(monkeypatch):
    from pyairbyte_spark import exceptions as exc
    from pyairbyte_spark.cloud import (
        CloudWorkspace,
        FakeCloudTransport,
        exchange_client_credentials,
        resolve_cloud_credentials,
    )

    transport = FakeCloudTransport()
    # no credentials at all → clear error
    monkeypatch.delenv("AIRBYTE_CLOUD_API_KEY", raising=False)
    with pytest.raises(exc.PyAirbyteInputError):
        resolve_cloud_credentials()

    # bearer-token path
    monkeypatch.setenv("AIRBYTE_CLOUD_API_KEY", "tok-x")
    monkeypatch.setenv("AIRBYTE_CLOUD_WORKSPACE_ID", "ws-9")
    ws = CloudWorkspace.from_env(transport=transport)
    assert ws.workspace_id == "ws-9"

    # client-credentials path: the grant is exchanged for a token
    monkeypatch.delenv("AIRBYTE_CLOUD_API_KEY")
    monkeypatch.setenv("AIRBYTE_CLOUD_CLIENT_ID", "cid")
    monkeypatch.setenv("AIRBYTE_CLOUD_CLIENT_SECRET", "csec")
    ws2 = CloudWorkspace.from_env(transport=transport)
    assert ws2.workspace_id == "ws-9"
    assert ("POST", "/applications/token") in [(m, p) for m, p, _ in transport.calls]
    assert exchange_client_credentials(transport, "cid", "csec").startswith(
        "fake-token-"
    )


def test_workspace_admin_and_organization(ws):
    from pyairbyte_spark import exceptions as exc
    from pyairbyte_spark.cloud import CloudWorkspace

    workspace, transport = ws
    transport.workspaces["ws-1"] = {
        "workspaceId": "ws-1",
        "name": "main ws",
        "organizationId": "org-1",
    }
    transport.workspaces["ws-2"] = {"workspaceId": "ws-2", "name": "other ws"}
    transport.organizations["org-1"] = {
        "organizationId": "org-1",
        "organizationName": "Acme",
        "email": "ops@acme.test",
        "paymentStatus": "ok",
        "subscriptionStatus": "active",
    }
    assert workspace.name == "main ws"
    assert [w["workspaceId"] for w in workspace.list_workspaces()] == ["ws-1", "ws-2"]
    assert workspace.list_workspaces(name="other ws")[0]["workspaceId"] == "ws-2"

    org = workspace.get_organization()
    assert org.organization_name == "Acme" and org.email == "ops@acme.test"
    assert not org.is_account_locked

    # delete: blocked by safe mode until renamed, then succeeds when empty
    with pytest.raises(exc.PyAirbyteInputError):
        workspace.permanently_delete()
    workspace.rename("deleteme ws")
    workspace.permanently_delete()
    assert "ws-1" not in transport.workspaces

    # a workspace with connections refuses deletion outright
    ws2 = CloudWorkspace(workspace_id="ws-2", transport=transport)
    transport.connections["c1"] = {"connectionId": "c1", "name": "x"}
    with pytest.raises(exc.PyAirbyteInputError):
        ws2.permanently_delete(safe_mode=False)


MANIFEST_YAML = """
name: source-inline-demo
version: "0.1.0"
streams:
  - name: colors
    primary_key: [id]
    source:
      type: inline
      records:
        - {id: 1, color: red}
        - {id: 2, color: blue}
"""


def test_custom_source_definition_lifecycle(ws):
    from pyairbyte_spark import exceptions as exc

    workspace, transport = ws
    defn = workspace.publish_custom_source_definition(
        "deleteme demo", manifest_yaml=MANIFEST_YAML
    )
    assert defn.name == "deleteme demo"
    assert defn.version == "0.1.0"
    assert defn.manifest["streams"][0]["name"] == "colors"

    # unique-name guard
    with pytest.raises(exc.AirbyteDuplicateResourcesError):
        workspace.publish_custom_source_definition(
            "deleteme demo", manifest_yaml=MANIFEST_YAML
        )

    listed = workspace.list_custom_source_definitions()
    assert [d.definition_id for d in listed] == [defn.definition_id]
    fetched = workspace.get_custom_source_definition(defn.definition_id)
    assert fetched.name == "deleteme demo"

    # update replaces the manifest (and re-validates it)
    new_manifest = dict(defn.manifest, version="0.2.0")
    defn.update_definition(new_manifest)
    assert defn.manifest["version"] == "0.2.0"
    defn.rename("deleteme demo v2")
    assert defn.name == "deleteme demo v2"

    # deploy an instance of the definition
    src = defn.deploy_source("deleteme inst", config={"count": 2})
    assert src.configuration["definitionId"] == defn.definition_id

    defn.permanently_delete()
    assert not transport.definitions


def test_custom_source_definition_validation(ws):
    from pyairbyte_spark import exceptions as exc

    workspace, _ = ws
    # YAML and docker are mutually exclusive; docker is unsupported
    with pytest.raises(exc.PyAirbyteInputError):
        workspace.publish_custom_source_definition("x")
    with pytest.raises(exc.PyAirbyteInputError):
        workspace.publish_custom_source_definition(
            "x", manifest_yaml=MANIFEST_YAML, docker_image="img"
        )
    with pytest.raises(exc.PyAirbyteInputError):
        workspace.publish_custom_source_definition("x", docker_image="img")
    with pytest.raises(NotImplementedError):
        workspace.publish_custom_source_definition(
            "x", docker_image="img", docker_tag="1.0"
        )
    # pre-validation rejects a stream-less manifest
    with pytest.raises(exc.PyAirbyteInputError):
        workspace.publish_custom_source_definition(
            "x", manifest_yaml={"name": "empty"}
        )
    # ...unless explicitly skipped
    defn = workspace.publish_custom_source_definition(
        "deleteme empty", manifest_yaml={"name": "empty"}, pre_validate=False
    )
    assert defn.manifest == {"name": "empty"}


def test_published_manifest_runs_as_declarative_source(ws, cache):
    """Round-trip: the manifest published to the workspace is the same
    document the local declarative engine executes."""
    from pyairbyte_spark.sources.declarative import DeclarativeSource

    workspace, _ = ws
    defn = workspace.publish_custom_source_definition(
        "deleteme rt", manifest_yaml=MANIFEST_YAML
    )
    src = DeclarativeSource(defn.manifest)
    res = src.read(cache, write_strategy="auto")
    assert res.record_counts["colors"] == 2


def test_sync_result_applies_table_prefix(spark, tmp_path):
    """A connection's table prefix must reach the dataset surface:
    get_dataset('users') on a connection with prefix 'pfx_' opens the
    on-disk table 'pfx_users' (reference sync_results.py:421-447)."""
    from pyairbyte_spark.cache import SparkCache
    from pyairbyte_spark.datasets import CachedDataset
    from pyairbyte_spark.sources import SourceFaker

    wh = tmp_path / "dest_wh"
    cache = SparkCache(spark, str(wh), table_prefix="pfx_")
    SourceFaker(seed=7, count=20).read(cache, write_strategy="auto")

    transport = FakeCloudTransport()
    transport.connections["conn-p"] = {
        "connectionId": "conn-p",
        "name": "prefixed",
        "sourceId": "src-1",
        "destinationId": "dest-p",
        "prefix": "pfx_",
        "configurations": {"streams": [{"name": "users"}]},
    }
    transport.destinations["dest-p"] = {
        "destinationId": "dest-p",
        "configuration": {"warehouse_dir": str(wh)},
    }
    ws = CloudWorkspace(workspace_id="ws-1", transport=transport)
    result = ws.get_connection("conn-p").get_sync_result(job_id=9)
    transport.jobs[9] = {"jobId": 9, "status": "succeeded"}
    assert result.get_sql_table_name("users") == "pfx_users"
    ds = result.get_dataset("users")
    assert isinstance(ds, CachedDataset) and len(ds) == 20
    assert set(result.streams) >= {"users", "products", "purchases"}
