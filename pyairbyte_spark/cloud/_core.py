"""Cloud workspace / connection / sync-result API (S17).

Parity surface for the reference's ``airbyte/cloud/`` package
(``workspaces.py``, ``connections.py``, ``sync_results.py:218-447``):
trigger syncs on a hosted workspace, poll job status, and open the
synced data as datasets. The network layer is a pluggable
:class:`CloudTransport` so the same object model runs against

- the real REST API (:class:`HttpTransport`, stdlib urllib — no extra
  dependency), or
- a file-backed fake in tests/offline sandboxes.

The reference's ``SyncResult.get_sql_cache()`` maps the connection's
destination configuration to a local cache object
(``sync_results.py:421-428``); here :func:`destination_to_cache` maps a
destination config to a :class:`~pyairbyte_spark.cache.SparkCache`
over the destination's warehouse path — the Spark-native analogue of
opening a JDBC engine on the destination, and the seam where real
JDBC-backed readers would plug in.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Protocol

from pyairbyte_spark import exceptions as exc

FINAL_STATUSES = {"succeeded", "failed", "cancelled"}
FAILED_STATUSES = {"failed", "cancelled"}
DEFAULT_SYNC_TIMEOUT_SECONDS = 30 * 60
JOB_WAIT_INTERVAL_SECS = 2.0
DEFAULT_API_ROOT = "https://api.airbyte.com/v1"


@dataclass(kw_only=True)
class CloudError(exc.PyAirbyteError):
    """Error interacting with a hosted workspace."""


@dataclass(kw_only=True)
class ConnectionSyncError(CloudError):
    """A sync job failed or was cancelled."""


@dataclass(kw_only=True)
class ConnectionSyncTimeoutError(ConnectionSyncError):
    """A sync job did not reach a final status in time."""


# -- transport ---------------------------------------------------------------


class CloudTransport(Protocol):
    """Minimal REST seam: every API interaction is one call."""

    def request(
        self, method: str, path: str, payload: dict | None = None
    ) -> dict[str, Any]: ...


class HttpTransport:
    """stdlib-urllib transport against the public Airbyte API.

    Auth is a bearer token (or client-credential exchange done by the
    caller). Kept import-light and dependency-free; anything beyond
    JSON-in/JSON-out belongs in the caller.
    """

    def __init__(
        self,
        *,
        api_root: str = DEFAULT_API_ROOT,
        bearer_token: str | None = None,
        timeout: float = 30.0,
    ) -> None:
        self.api_root = api_root.rstrip("/")
        self.bearer_token = bearer_token
        self.timeout = timeout

    def request(
        self, method: str, path: str, payload: dict | None = None
    ) -> dict[str, Any]:
        import urllib.request

        url = f"{self.api_root}{path}"
        data = json.dumps(payload).encode() if payload is not None else None
        req = urllib.request.Request(url, data=data, method=method)
        req.add_header("Content-Type", "application/json")
        req.add_header("Accept", "application/json")
        if self.bearer_token:
            req.add_header("Authorization", f"Bearer {self.bearer_token}")
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:  # noqa: S310
            body = resp.read().decode() or "{}"
        return json.loads(body)


class FakeCloudTransport:
    """In-memory workspace state for tests and offline use.

    Seed with jobs/connections/destinations; mutate ``jobs`` between
    polls to script status transitions. Implements the read routes the
    sync-result surface uses plus the management CRUD routes
    (sources/destinations/connections create, patch, delete, check).
    """

    def __init__(self) -> None:
        self.sources: dict[str, dict] = {}
        self.connections: dict[str, dict] = {}
        self.destinations: dict[str, dict] = {}
        self.definitions: dict[str, dict] = {}
        self.workspaces: dict[str, dict] = {}
        self.organizations: dict[str, dict] = {}
        self.jobs: dict[int, dict] = {}
        self.calls: list[tuple[str, str, dict | None]] = []
        self._next_job_id = 1000
        self._next_id = 1
        # Scriptable check outcome per connector id (default: succeed).
        self.check_failures: dict[str, str] = {}

    def _new_id(self, prefix: str) -> str:
        nid = f"{prefix}-{self._next_id}"
        self._next_id += 1
        return nid

    def _collection(self, kind: str) -> dict[str, dict]:
        return {
            "sources": self.sources,
            "destinations": self.destinations,
            "connections": self.connections,
            "custom-source-definitions": self.definitions,
            "workspaces": self.workspaces,
            "organizations": self.organizations,
        }[kind]

    def request(  # noqa: PLR0911, PLR0912 - route table
        self, method: str, path: str, payload: dict | None = None
    ) -> dict[str, Any]:
        self.calls.append((method, path, payload))
        path = path.split("?", 1)[0]
        parts = [p for p in path.split("/") if p]

        if path == "/applications/token" and method == "POST":
            p = payload or {}
            if not p.get("client_id") or not p.get("client_secret"):
                raise KeyError("client_id and client_secret are required")
            return {
                "access_token": f"fake-token-{p['client_id']}",
                "token_type": "Bearer",
                "expires_in": 900,
            }
        if path == "/jobs" and method == "POST":
            job_id = self._next_job_id
            self._next_job_id += 1
            self.jobs[job_id] = {
                "jobId": job_id,
                "status": "running",
                "jobType": (payload or {}).get("jobType", "sync"),
                "connectionId": (payload or {}).get("connectionId"),
                "rowsSynced": 0,
                "bytesSynced": 0,
            }
            return self.jobs[job_id]
        if path == "/jobs":  # GET list (filtering is the caller's job)
            return {"data": list(self.jobs.values())}
        if path.startswith("/jobs/"):
            return self.jobs[int(parts[1])]

        if parts and parts[0] in (
            "sources",
            "destinations",
            "connections",
            "custom-source-definitions",
            "workspaces",
            "organizations",
        ):
            coll = self._collection(parts[0])
            id_key = {
                "sources": "sourceId",
                "destinations": "destinationId",
                "connections": "connectionId",
                "custom-source-definitions": "definitionId",
                "workspaces": "workspaceId",
                "organizations": "organizationId",
            }[parts[0]]
            if len(parts) == 1 and method == "POST":
                rid = self._new_id(parts[0][:4].rstrip("s"))
                coll[rid] = {id_key: rid, **(payload or {})}
                return coll[rid]
            if len(parts) == 1:  # GET list
                return {"data": list(coll.values())}
            rid = parts[1]
            if len(parts) == 3 and parts[2] == "check" and method == "POST":
                message = self.check_failures.get(rid)
                return (
                    {"status": "failed", "message": message}
                    if message is not None
                    else {"status": "succeeded", "message": None}
                )
            if rid not in coll:
                raise KeyError(f"no such {parts[0][:-1]}: {rid}")
            if method == "PATCH":
                coll[rid].update(payload or {})
                return coll[rid]
            if method == "DELETE":
                return coll.pop(rid)
            return coll[rid]
        raise KeyError(f"unhandled fake route: {method} {path}")


# -- credentials (reference cloud/auth.py + _credentials.py) ------------------

CLOUD_API_URL_ENV = "AIRBYTE_CLOUD_API_URL"
CLOUD_BEARER_TOKEN_ENV = "AIRBYTE_CLOUD_API_KEY"
CLOUD_CLIENT_ID_ENV = "AIRBYTE_CLOUD_CLIENT_ID"
CLOUD_CLIENT_SECRET_ENV = "AIRBYTE_CLOUD_CLIENT_SECRET"
CLOUD_WORKSPACE_ID_ENV = "AIRBYTE_CLOUD_WORKSPACE_ID"


@dataclass
class CloudCredentials:
    """Resolved hosted-API credentials: a bearer token, or a client-id/
    secret pair to exchange for one."""

    bearer_token: str | None = None
    client_id: str | None = None
    client_secret: str | None = None
    workspace_id: str | None = None
    api_url: str = DEFAULT_API_ROOT


def resolve_cloud_credentials(
    *,
    bearer_token: str | None = None,
    client_id: str | None = None,
    client_secret: str | None = None,
    workspace_id: str | None = None,
    api_url: str | None = None,
) -> CloudCredentials:
    """Explicit values win; otherwise each field resolves through the
    secret sources / env (AIRBYTE_CLOUD_* names)."""
    from pyairbyte_spark.secrets import get_secret

    def _opt(explicit: str | None, env_name: str) -> str | None:
        if explicit is not None:
            return explicit
        value = get_secret(env_name, default="", allow_prompt=False)
        return str(value) or None

    creds = CloudCredentials(
        bearer_token=_opt(bearer_token, CLOUD_BEARER_TOKEN_ENV),
        client_id=_opt(client_id, CLOUD_CLIENT_ID_ENV),
        client_secret=_opt(client_secret, CLOUD_CLIENT_SECRET_ENV),
        workspace_id=_opt(workspace_id, CLOUD_WORKSPACE_ID_ENV),
        api_url=_opt(api_url, CLOUD_API_URL_ENV) or DEFAULT_API_ROOT,
    )
    if not creds.bearer_token and not (creds.client_id and creds.client_secret):
        raise exc.PyAirbyteInputError(
            message="No hosted-API credentials found.",
            context={
                "guidance": f"Set {CLOUD_BEARER_TOKEN_ENV}, or "
                f"{CLOUD_CLIENT_ID_ENV} + {CLOUD_CLIENT_SECRET_ENV}."
            },
        )
    return creds


def exchange_client_credentials(
    transport: CloudTransport, client_id: str, client_secret: str
) -> str:
    """client-credentials grant → bearer token
    (``POST /applications/token``)."""
    doc = transport.request(
        "POST",
        "/applications/token",
        {
            "grant_type": "client_credentials",
            "client_id": client_id,
            "client_secret": client_secret,
        },
    )
    token = doc.get("access_token")
    if not token:
        raise CloudError(
            message="Token exchange returned no access_token.",
            context={"keys": sorted(doc)},
        )
    return token


# -- destination → cache seam ------------------------------------------------


def destination_to_cache(
    destination_configuration: dict[str, Any], *, table_prefix: str = ""
):
    """Map a destination's configuration to a cache over its data
    (reference ``cloud/sync_results.py:421-428`` →
    ``destinations/_translate_dest_to_cache.py``).

    Spark-native mapping: any destination that lands files on a
    warehouse path (``warehouse_dir`` / ``destination_path``) opens as
    a :class:`SparkCache` on that path. JDBC-style destinations would
    plug in here; in this build they raise with the config preserved.
    """
    from pyairbyte_spark.cache import SparkCache
    from pyairbyte_spark.session import get_spark

    path = destination_configuration.get(
        "warehouse_dir"
    ) or destination_configuration.get("destination_path")
    if not path:
        from pyairbyte_spark import jdbc

        try:
            url = jdbc.jdbc_url(destination_configuration)
        except exc.PyAirbyteInputError:
            url = None
        if url is not None:
            raise exc.PyAirbyteInputError(
                message=(
                    "Destination is an external JDBC warehouse; open tables "
                    "with pyairbyte_spark.jdbc.read_table (partitioned reads) "
                    "instead of a path-backed cache."
                ),
                context={"jdbc_url": url},
            )
        raise exc.PyAirbyteInputError(
            message="Destination configuration has no warehouse path to open.",
            context={"keys": sorted(destination_configuration)},
        )
    schema = destination_configuration.get("schema_name", "airbyte_raw")
    return SparkCache(
        get_spark(), str(path), schema_name=schema, table_prefix=table_prefix
    )


# -- object model ------------------------------------------------------------


def _guard_deletion(name: str | None, kind: str, *, safe_mode: bool) -> None:
    """Safe-mode deletes require an explicit opt-in in the resource name
    (reference ``workspaces.py:471-537``: 'delete-me'/'deleteme')."""
    if not safe_mode:
        return
    normalized = (name or "").lower().replace("_", "-")
    if "delete-me" not in normalized and "deleteme" not in normalized:
        raise exc.PyAirbyteInputError(
            message=(
                f"Refusing to delete {kind} without 'delete-me' in its name. "
                "Rename it or pass safe_mode=False."
            ),
            input_value=name or "<unnamed>",
        )


@dataclass
class CheckResult:
    """Result of a hosted connector check (reference
    ``cloud/connectors.py:66-91``); truthy on success."""

    success: bool
    error_message: str | None = None
    internal_error: str | None = None

    def __bool__(self) -> bool:
        return self.success

    def __str__(self) -> str:
        return "Success" if self.success else f"Failed: {self.error_message}"


@dataclass
class CloudWorkspace:
    """Handle on one hosted workspace (reference ``workspaces.py:70``)."""

    workspace_id: str
    transport: CloudTransport

    @classmethod
    def from_env(
        cls, *, transport: CloudTransport | None = None, **overrides: str | None
    ) -> CloudWorkspace:
        """Workspace from resolved credentials (reference
        ``workspaces.py:155``): bearer token directly, or a client-id/
        secret pair exchanged for one."""
        creds = resolve_cloud_credentials(**overrides)
        if not creds.workspace_id:
            raise exc.PyAirbyteInputError(
                message="No workspace id found.",
                context={"guidance": f"Set {CLOUD_WORKSPACE_ID_ENV}."},
            )
        if transport is None:
            token = creds.bearer_token
            if not token:
                bootstrap = HttpTransport(api_root=creds.api_url)
                token = exchange_client_credentials(
                    bootstrap, creds.client_id, creds.client_secret
                )
            transport = HttpTransport(api_root=creds.api_url, bearer_token=token)
        elif not creds.bearer_token and creds.client_id and creds.client_secret:
            # Injected transports still exercise the exchange path so the
            # grant flow is testable offline.
            exchange_client_credentials(
                transport, creds.client_id, creds.client_secret
            )
        return cls(workspace_id=creds.workspace_id, transport=transport)

    # -- workspace admin (reference workspaces.py:644-701) -------------------

    def _workspace_info(self, *, force_refresh: bool = False) -> dict[str, Any]:
        return self.transport.request("GET", f"/workspaces/{self.workspace_id}")

    @property
    def name(self) -> str | None:
        try:
            return self._workspace_info().get("name")
        except Exception:  # noqa: BLE001 - metadata is best-effort
            return None

    def list_workspaces(
        self,
        name: str | None = None,
        *,
        name_filter: Callable[[str], bool] | None = None,
        limit: int | None = None,
    ) -> list[dict[str, Any]]:
        doc = self.transport.request("GET", "/workspaces")
        return _filter_named(doc.get("data", []), name, name_filter, limit)

    def rename(self, name: str) -> CloudWorkspace:
        self.transport.request(
            "PATCH", f"/workspaces/{self.workspace_id}", {"name": name}
        )
        return self

    def permanently_delete(self, *, safe_mode: bool = True) -> None:
        """Delete this workspace; refuses while connections exist."""
        if self.list_connections():
            raise exc.PyAirbyteInputError(
                message="Workspace still has connections; delete them first.",
                input_value=self.workspace_id,
            )
        _guard_deletion(self.name, "workspace", safe_mode=safe_mode)
        self.transport.request("DELETE", f"/workspaces/{self.workspace_id}")

    def get_organization(self, organization_id: str | None = None) -> CloudOrganization:
        org_id = organization_id or self._workspace_info().get("organizationId")
        if not org_id:
            raise exc.PyAirbyteInputError(
                message="Workspace has no organization id.",
                input_value=self.workspace_id,
            )
        return CloudOrganization(workspace=self, organization_id=org_id)

    def get_connection(self, connection_id: str) -> CloudConnection:
        return CloudConnection(workspace=self, connection_id=connection_id)

    def list_sync_jobs(
        self, *, connection_id: str | None = None, limit: int | None = None
    ) -> list[dict[str, Any]]:
        """Sync-job rows, newest first, optionally for one connection."""
        doc = self.transport.request("GET", "/jobs")
        rows = [
            r
            for r in doc.get("data", [])
            if connection_id is None or r.get("connectionId") == connection_id
        ]
        rows.sort(key=lambda r: r.get("jobId", 0), reverse=True)
        return rows[:limit] if limit is not None else rows

    def list_connections(
        self,
        name: str | None = None,
        *,
        name_filter: Callable[[str], bool] | None = None,
        limit: int | None = None,
    ) -> list[CloudConnection]:
        doc = self.transport.request(
            "GET", f"/connections?workspaceIds={self.workspace_id}"
        )
        rows = _filter_named(doc.get("data", []), name, name_filter, limit)
        return [
            CloudConnection(
                workspace=self,
                connection_id=row["connectionId"],
                _info=row,
            )
            for row in rows
        ]

    # -- connector management (reference workspaces.py:368-779) --------------

    def get_source(self, source_id: str) -> CloudSource:
        return CloudSource(workspace=self, connector_id=source_id)

    def get_destination(self, destination_id: str) -> CloudDestination:
        return CloudDestination(workspace=self, connector_id=destination_id)

    def list_sources(
        self,
        name: str | None = None,
        *,
        name_filter: Callable[[str], bool] | None = None,
        limit: int | None = None,
    ) -> list[CloudSource]:
        doc = self.transport.request(
            "GET", f"/sources?workspaceIds={self.workspace_id}"
        )
        rows = _filter_named(doc.get("data", []), name, name_filter, limit)
        return [
            CloudSource(workspace=self, connector_id=r["sourceId"], _info=r)
            for r in rows
        ]

    def list_destinations(
        self,
        name: str | None = None,
        *,
        name_filter: Callable[[str], bool] | None = None,
        limit: int | None = None,
    ) -> list[CloudDestination]:
        doc = self.transport.request(
            "GET", f"/destinations?workspaceIds={self.workspace_id}"
        )
        rows = _filter_named(doc.get("data", []), name, name_filter, limit)
        return [
            CloudDestination(
                workspace=self, connector_id=r["destinationId"], _info=r
            )
            for r in rows
        ]

    def deploy_source(
        self,
        name: str,
        source: Any,
        *,
        unique: bool = True,
        random_name_suffix: bool = False,
    ) -> CloudSource:
        """Deploy a local source definition (a ``SparkSource`` or a config
        dict carrying ``sourceType``) to the workspace."""
        if isinstance(source, dict):
            config = dict(source)
            if "sourceType" not in config:
                raise exc.PyAirbyteInputError(
                    message="Missing `sourceType` in configuration dictionary."
                )
        else:
            config = dict(getattr(source, "config", None) or {})
            config["sourceType"] = str(
                getattr(source, "name", "source")
            ).removeprefix("source-")
        if random_name_suffix:
            name += f" (ID: {_random_suffix()})"
        if unique and self.list_sources(name=name):
            raise exc.AirbyteDuplicateResourcesError(
                resource_type="source", resource_name=name
            )
        doc = self.transport.request(
            "POST",
            "/sources",
            {
                "name": name,
                "workspaceId": self.workspace_id,
                "configuration": config,
            },
        )
        return CloudSource(workspace=self, connector_id=doc["sourceId"], _info=doc)

    def deploy_destination(
        self,
        name: str,
        destination: Any,
        *,
        unique: bool = True,
        random_name_suffix: bool = False,
    ) -> CloudDestination:
        """Deploy a destination (a ``SparkDestination`` or a config dict
        carrying ``destinationType``) to the workspace."""
        if isinstance(destination, dict):
            config = dict(destination)
            if "destinationType" not in config:
                raise exc.PyAirbyteInputError(
                    message="Missing `destinationType` in configuration dictionary."
                )
        else:
            config = dict(getattr(destination, "config", None) or {})
            config["destinationType"] = str(
                getattr(destination, "name", "destination")
            ).removeprefix("destination-")
        if random_name_suffix:
            name += f" (ID: {_random_suffix()})"
        if unique and self.list_destinations(name=name):
            raise exc.AirbyteDuplicateResourcesError(
                resource_type="destination", resource_name=name
            )
        doc = self.transport.request(
            "POST",
            "/destinations",
            {
                "name": name,
                "workspaceId": self.workspace_id,
                "configuration": config,
            },
        )
        return CloudDestination(
            workspace=self, connector_id=doc["destinationId"], _info=doc
        )

    def deploy_connection(
        self,
        connection_name: str,
        *,
        source: CloudSource | str,
        selected_streams: list[str],
        destination: CloudDestination | str,
        table_prefix: str | None = None,
    ) -> CloudConnection:
        """Connect an already-deployed source and destination."""
        if not selected_streams:
            raise exc.PyAirbyteInputError(
                message="You must provide `selected_streams` when creating a connection."
            )
        source_id = source if isinstance(source, str) else source.connector_id
        destination_id = (
            destination if isinstance(destination, str) else destination.connector_id
        )
        doc = self.transport.request(
            "POST",
            "/connections",
            {
                "name": connection_name,
                "workspaceId": self.workspace_id,
                "sourceId": source_id,
                "destinationId": destination_id,
                "prefix": table_prefix or "",
                "configurations": {
                    "streams": [{"name": s} for s in selected_streams]
                },
            },
        )
        return CloudConnection(
            workspace=self, connection_id=doc["connectionId"], _info=doc
        )

    # -- custom source definitions (reference workspaces.py:781-925) ---------

    def publish_custom_source_definition(
        self,
        name: str,
        *,
        manifest_yaml: Any = None,
        docker_image: str | None = None,
        docker_tag: str | None = None,
        unique: bool = True,
        pre_validate: bool = True,
    ) -> CustomCloudSourceDefinition:
        """Publish a declarative-manifest source definition to the
        workspace (YAML only; Docker definitions raise, as in the
        reference)."""
        return _publish_custom_source_definition(
            self,
            name,
            manifest_yaml=manifest_yaml,
            docker_image=docker_image,
            docker_tag=docker_tag,
            unique=unique,
            pre_validate=pre_validate,
        )

    def list_custom_source_definitions(
        self, *, definition_type: str = "yaml"
    ) -> list[CustomCloudSourceDefinition]:
        return _list_custom_source_definitions(self, definition_type=definition_type)

    def get_custom_source_definition(
        self, definition_id: str, *, definition_type: str = "yaml"
    ) -> CustomCloudSourceDefinition:
        return _get_custom_source_definition(
            self, definition_id, definition_type=definition_type
        )

    def permanently_delete_source(
        self, source: str | CloudSource, *, safe_mode: bool = True
    ) -> None:
        if not isinstance(source, (str, CloudSource)):
            raise exc.PyAirbyteInputError(
                message="Invalid source type.", input_value=type(source).__name__
            )
        obj = self.get_source(source) if isinstance(source, str) else source
        _guard_deletion(obj.name, "source", safe_mode=safe_mode)
        self.transport.request("DELETE", f"/sources/{obj.connector_id}")

    def permanently_delete_destination(
        self, destination: str | CloudDestination, *, safe_mode: bool = True
    ) -> None:
        if not isinstance(destination, (str, CloudDestination)):
            raise exc.PyAirbyteInputError(
                message="Invalid destination type.",
                input_value=type(destination).__name__,
            )
        obj = (
            self.get_destination(destination)
            if isinstance(destination, str)
            else destination
        )
        _guard_deletion(obj.name, "destination", safe_mode=safe_mode)
        self.transport.request("DELETE", f"/destinations/{obj.connector_id}")

    def permanently_delete_connection(
        self,
        connection: str | CloudConnection,
        *,
        cascade_delete_source: bool = False,
        cascade_delete_destination: bool = False,
        safe_mode: bool = True,
    ) -> None:
        if isinstance(connection, str):
            connection = self.get_connection(connection)
        _guard_deletion(connection.name, "connection", safe_mode=safe_mode)
        source_id = connection.source_id if cascade_delete_source else None
        destination_id = (
            connection.destination_id if cascade_delete_destination else None
        )
        self.transport.request(
            "DELETE", f"/connections/{connection.connection_id}"
        )
        if source_id:
            self.permanently_delete_source(source_id, safe_mode=safe_mode)
        if destination_id:
            self.permanently_delete_destination(
                destination_id, safe_mode=safe_mode
            )


def _filter_named(
    rows: list[dict],
    name: str | None,
    name_filter: Callable[[str], bool] | None,
    limit: int | None,
) -> list[dict]:
    if name is not None:
        rows = [r for r in rows if r.get("name") == name]
    if name_filter is not None:
        rows = [r for r in rows if name_filter(r.get("name") or "")]
    return rows[:limit] if limit is not None else rows


def _random_suffix() -> str:
    import secrets

    return secrets.token_hex(4)


class CloudConnector:
    """A deployed source or destination (reference
    ``cloud/connectors.py:94-183``)."""

    connector_type = "connector"

    def __init__(
        self,
        *,
        workspace: CloudWorkspace,
        connector_id: str,
        _info: dict[str, Any] | None = None,
    ) -> None:
        self.workspace = workspace
        self.connector_id = connector_id
        self._info = _info

    def _fetch_info(self, *, force_refresh: bool = False) -> dict[str, Any]:
        if self._info is None or force_refresh:
            self._info = self.workspace.transport.request(
                "GET", f"/{self.connector_type}s/{self.connector_id}"
            )
        return self._info

    @property
    def name(self) -> str | None:
        return self._fetch_info().get("name")

    @property
    def configuration(self) -> dict[str, Any]:
        return self._fetch_info().get("configuration", {})

    def rename(self, name: str) -> CloudConnector:
        self._info = self.workspace.transport.request(
            "PATCH", f"/{self.connector_type}s/{self.connector_id}", {"name": name}
        )
        return self

    def update_config(self, config: dict[str, Any]) -> CloudConnector:
        """Merge new values into the deployed connector's configuration."""
        merged = {**self.configuration, **config}
        self._info = self.workspace.transport.request(
            "PATCH",
            f"/{self.connector_type}s/{self.connector_id}",
            {"configuration": merged},
        )
        return self

    def check(self, *, raise_on_error: bool = True) -> CheckResult:
        try:
            doc = self.workspace.transport.request(
                "POST", f"/{self.connector_type}s/{self.connector_id}/check"
            )
        except Exception as ex:  # noqa: BLE001 - surfaced in the result
            result = CheckResult(success=False, internal_error=str(ex))
        else:
            result = CheckResult(
                success=doc.get("status") == "succeeded",
                error_message=doc.get("message"),
            )
        if raise_on_error and not result:
            raise CloudError(
                message="Connector check failed.",
                context={
                    "connector_id": self.connector_id,
                    "error": result.error_message or result.internal_error,
                },
            )
        return result

    def permanently_delete(self, *, safe_mode: bool = True) -> None:
        if self.connector_type == "source":
            self.workspace.permanently_delete_source(self, safe_mode=safe_mode)
        else:
            self.workspace.permanently_delete_destination(self, safe_mode=safe_mode)


class CloudSource(CloudConnector):
    connector_type = "source"

    @property
    def source_id(self) -> str:
        return self.connector_id


class CloudDestination(CloudConnector):
    connector_type = "destination"

    @property
    def destination_id(self) -> str:
        return self.connector_id


class CloudOrganization:
    """Billing/account container above workspaces (reference
    ``cloud/organizations.py:17-114``)."""

    def __init__(self, *, workspace: CloudWorkspace, organization_id: str) -> None:
        self.workspace = workspace
        self.organization_id = organization_id
        self._info: dict[str, Any] | None = None

    def _fetch_info(self, *, force_refresh: bool = False) -> dict[str, Any]:
        if self._info is None or force_refresh:
            self._info = self.workspace.transport.request(
                "GET", f"/organizations/{self.organization_id}"
            )
        return self._info

    @property
    def organization_name(self) -> str | None:
        return self._fetch_info().get("organizationName")

    @property
    def email(self) -> str | None:
        return self._fetch_info().get("email")

    @property
    def payment_status(self) -> str | None:
        return self._fetch_info().get("paymentStatus")

    @property
    def subscription_status(self) -> str | None:
        return self._fetch_info().get("subscriptionStatus")

    @property
    def is_account_locked(self) -> bool:
        return self.payment_status in ("locked", "disabled")


# -- custom source definitions ------------------------------------------------


def _load_manifest_any(manifest: Any) -> dict[str, Any]:
    """dict / JSON string / YAML string / path → manifest dict."""
    from pathlib import Path

    if isinstance(manifest, dict):
        return manifest
    if isinstance(manifest, Path):
        manifest = str(manifest)
    from pyairbyte_spark.sources.declarative import load_manifest

    try:
        return load_manifest(manifest)
    except (OSError, ValueError):
        # Inline YAML string (load_manifest handles paths + JSON).
        try:
            import yaml  # optional dependency

            doc = yaml.safe_load(manifest)
        except ImportError as ex:  # pragma: no cover - yaml is present in CI
            raise exc.PyAirbyteInputError(
                message="Cannot parse manifest: not JSON and no YAML parser available."
            ) from ex
        if not isinstance(doc, dict):
            raise exc.PyAirbyteInputError(
                message="Manifest must parse to a mapping.",
                input_value=str(type(doc).__name__),
            )
        return doc


class CustomCloudSourceDefinition:
    """A workspace-published declarative (YAML) source definition
    (reference ``workspaces.py:781-925`` + ``connectors.py:362-775``)."""

    def __init__(
        self,
        *,
        workspace: CloudWorkspace,
        definition_id: str,
        _info: dict[str, Any] | None = None,
    ) -> None:
        self.workspace = workspace
        self.definition_id = definition_id
        self._info = _info

    def _fetch_info(self, *, force_refresh: bool = False) -> dict[str, Any]:
        if self._info is None or force_refresh:
            self._info = self.workspace.transport.request(
                "GET", f"/custom-source-definitions/{self.definition_id}"
            )
        return self._info

    @property
    def name(self) -> str | None:
        return self._fetch_info().get("name")

    @property
    def manifest(self) -> dict[str, Any] | None:
        return self._fetch_info().get("manifest")

    @property
    def version(self) -> str | None:
        return self._fetch_info().get("version")

    def rename(self, name: str) -> CustomCloudSourceDefinition:
        self._info = self.workspace.transport.request(
            "PATCH", f"/custom-source-definitions/{self.definition_id}", {"name": name}
        )
        return self

    def update_definition(self, manifest: Any) -> CustomCloudSourceDefinition:
        """Replace the manifest (validated the same way publish does)."""
        doc = _load_manifest_any(manifest)
        _validate_manifest(doc)
        self._info = self.workspace.transport.request(
            "PATCH",
            f"/custom-source-definitions/{self.definition_id}",
            {"manifest": doc},
        )
        return self

    def deploy_source(
        self, name: str, *, config: dict[str, Any] | None = None, unique: bool = True
    ) -> CloudSource:
        """Deploy a source instance of this definition (reference
        ``connectors.py:777-830``)."""
        return self.workspace.deploy_source(
            name,
            {
                **(config or {}),
                "sourceType": "custom",
                "definitionId": self.definition_id,
            },
            unique=unique,
        )

    def permanently_delete(self, *, safe_mode: bool = True) -> None:
        _guard_deletion(self.name, "custom source definition", safe_mode=safe_mode)
        self.workspace.transport.request(
            "DELETE", f"/custom-source-definitions/{self.definition_id}"
        )


def _validate_manifest(doc: dict[str, Any]) -> None:
    """Client-side pre-validation: the manifest must declare at least one
    stream the declarative engine can resolve."""
    from pyairbyte_spark.sources.declarative import DeclarativeSource

    catalog = DeclarativeSource(doc, name="manifest-validate").discovered_catalog()
    if not catalog:
        raise exc.PyAirbyteInputError(
            message="Manifest declares no streams.", context={"keys": sorted(doc)}
        )


def _publish_custom_source_definition(
    workspace: CloudWorkspace,
    name: str,
    *,
    manifest_yaml: Any = None,
    docker_image: str | None = None,
    docker_tag: str | None = None,
    unique: bool = True,
    pre_validate: bool = True,
) -> CustomCloudSourceDefinition:
    is_yaml = manifest_yaml is not None
    is_docker = docker_image is not None
    if is_yaml == is_docker:
        raise exc.PyAirbyteInputError(
            message=(
                "Specify EITHER manifest_yaml (YAML connectors) OR "
                "docker_image + docker_tag (Docker connectors), not both."
            )
        )
    if is_docker:
        if docker_tag is None:
            raise exc.PyAirbyteInputError(
                message="docker_tag is required with docker_image.",
                context={"docker_image": docker_image},
            )
        raise NotImplementedError(
            "Docker custom source definitions are not supported; "
            "only YAML manifest definitions are."
        )
    doc = _load_manifest_any(manifest_yaml)
    if pre_validate:
        _validate_manifest(doc)
    if unique and any(
        d.name == name for d in workspace.list_custom_source_definitions()
    ):
        raise exc.AirbyteDuplicateResourcesError(
            resource_type="custom_source_definition", resource_name=name
        )
    info = workspace.transport.request(
        "POST",
        "/custom-source-definitions",
        {
            "name": name,
            "workspaceId": workspace.workspace_id,
            "manifest": doc,
            "version": doc.get("version"),
        },
    )
    return CustomCloudSourceDefinition(
        workspace=workspace, definition_id=info["definitionId"], _info=info
    )


def _list_custom_source_definitions(
    workspace: CloudWorkspace, *, definition_type: str = "yaml"
) -> list[CustomCloudSourceDefinition]:
    if definition_type != "yaml":
        raise NotImplementedError(
            "Docker custom source definitions are not supported."
        )
    doc = workspace.transport.request(
        "GET", f"/custom-source-definitions?workspaceIds={workspace.workspace_id}"
    )
    return [
        CustomCloudSourceDefinition(
            workspace=workspace, definition_id=r["definitionId"], _info=r
        )
        for r in doc.get("data", [])
    ]


def _get_custom_source_definition(
    workspace: CloudWorkspace, definition_id: str, *, definition_type: str = "yaml"
) -> CustomCloudSourceDefinition:
    if definition_type != "yaml":
        raise NotImplementedError(
            "Docker custom source definitions are not supported."
        )
    return CustomCloudSourceDefinition(
        workspace=workspace, definition_id=definition_id
    )




@dataclass
class CloudConnection:
    """One deployed source→destination connection
    (reference ``connections.py:43``)."""

    workspace: CloudWorkspace
    connection_id: str
    _info: dict[str, Any] | None = None

    def _fetch_info(self, *, force_refresh: bool = False) -> dict[str, Any]:
        if self._info is None or force_refresh:
            self._info = self.workspace.transport.request(
                "GET", f"/connections/{self.connection_id}"
            )
        return self._info

    @property
    def name(self) -> str | None:
        return self._fetch_info().get("name")

    @property
    def source_id(self) -> str:
        return self._fetch_info()["sourceId"]

    @property
    def destination_id(self) -> str:
        return self._fetch_info()["destinationId"]

    @property
    def stream_names(self) -> list[str]:
        cfg = self._fetch_info().get("configurations", {})
        return [s["name"] for s in cfg.get("streams", [])]

    @property
    def table_prefix(self) -> str:
        return self._fetch_info().get("prefix") or ""

    def run_sync(self, *, wait: bool = False, wait_timeout: int = 300) -> SyncResult:
        doc = self.workspace.transport.request(
            "POST",
            "/jobs",
            {"connectionId": self.connection_id, "jobType": "sync"},
        )
        result = SyncResult(
            workspace=self.workspace, connection=self, job_id=int(doc["jobId"])
        )
        if wait:
            result.wait_for_completion(
                wait_timeout=wait_timeout, raise_failure=True
            )
        return result

    def get_sync_result(self, job_id: int) -> SyncResult:
        return SyncResult(workspace=self.workspace, connection=self, job_id=job_id)


@dataclass
class SyncResult:
    """The result of a sync job (reference ``sync_results.py:218-447``).

    Job metadata comes from the transport; the data surface
    (:meth:`get_sql_cache` / :meth:`get_dataset` /
    :meth:`get_sql_table_name`) opens the destination's warehouse as a
    SparkCache and hands back the same dataset objects local syncs use.
    """

    workspace: CloudWorkspace
    connection: CloudConnection
    job_id: int
    _latest_job_info: dict[str, Any] | None = field(default=None, repr=False)
    _cache: Any = field(default=None, repr=False)
    _sleep: Callable[[float], None] = field(default=time.sleep, repr=False)

    def _fetch_latest_job_info(self) -> dict[str, Any]:
        if (
            self._latest_job_info is not None
            and self._latest_job_info.get("status") in FINAL_STATUSES
        ):
            return self._latest_job_info
        self._latest_job_info = self.workspace.transport.request(
            "GET", f"/jobs/{self.job_id}"
        )
        return self._latest_job_info

    def get_job_status(self) -> str:
        return self._fetch_latest_job_info()["status"]

    def is_job_complete(self) -> bool:
        return self.get_job_status() in FINAL_STATUSES

    @property
    def records_synced(self) -> int:
        return int(self._fetch_latest_job_info().get("rowsSynced") or 0)

    @property
    def bytes_synced(self) -> int:
        return int(self._fetch_latest_job_info().get("bytesSynced") or 0)

    def raise_failure_status(self, *, refresh_status: bool = False) -> None:
        status = (
            self.get_job_status()
            if refresh_status or self._latest_job_info is None
            else self._latest_job_info["status"]
        )
        if status in FAILED_STATUSES:
            raise ConnectionSyncError(
                message="Sync job failed.",
                context={
                    "connection_id": self.connection.connection_id,
                    "job_id": self.job_id,
                    "job_status": status,
                },
            )

    def wait_for_completion(
        self,
        *,
        wait_timeout: int = DEFAULT_SYNC_TIMEOUT_SECONDS,
        raise_timeout: bool = True,
        raise_failure: bool = False,
    ) -> str:
        start = time.monotonic()
        while True:
            status = self.get_job_status()
            if status in FINAL_STATUSES:
                if raise_failure:
                    self.raise_failure_status()
                return status
            if time.monotonic() - start > wait_timeout:
                if raise_timeout:
                    raise ConnectionSyncTimeoutError(
                        message="Sync job did not complete in time.",
                        context={
                            "job_id": self.job_id,
                            "job_status": status,
                            "timeout": wait_timeout,
                        },
                    )
                return status
            self._sleep(JOB_WAIT_INTERVAL_SECS)

    # -- data surface --------------------------------------------------------

    def _get_destination_configuration(self) -> dict[str, Any]:
        dest_id = self.connection.destination_id
        doc = self.workspace.transport.request("GET", f"/destinations/{dest_id}")
        return doc.get("configuration", doc)

    def get_sql_cache(self):
        if self._cache is None:
            # The cache itself carries the connection's table prefix so
            # get_dataset/streams resolve prefixed on-disk tables from
            # bare stream names (reference sync_results.py:421-434).
            self._cache = destination_to_cache(
                self._get_destination_configuration(),
                table_prefix=self.connection.table_prefix,
            )
        return self._cache

    def get_sql_table_name(self, stream_name: str) -> str:
        return self.get_sql_cache().table_name(stream_name)

    def get_dataset(self, stream_name: str):
        """The synced stream as a CachedDataset (reference
        ``sync_results.py:442-447``)."""
        return self.get_sql_cache().get_dataset(stream_name)

    @property
    def streams(self) -> dict[str, Any]:
        cache = self.get_sql_cache()
        return {name: cache.get_dataset(name) for name in cache.stream_names}
