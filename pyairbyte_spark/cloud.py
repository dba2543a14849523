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
    polls to script status transitions. Implements just the routes the
    object model uses.
    """

    def __init__(self) -> None:
        self.connections: dict[str, dict] = {}
        self.destinations: dict[str, dict] = {}
        self.jobs: dict[int, dict] = {}
        self.calls: list[tuple[str, str, dict | None]] = []
        self._next_job_id = 1000

    def request(
        self, method: str, path: str, payload: dict | None = None
    ) -> dict[str, Any]:
        self.calls.append((method, path, payload))
        path = path.split("?", 1)[0]
        if path.startswith("/connections/"):
            return self.connections[path.rsplit("/", 1)[1]]
        if path == "/connections":
            return {"data": list(self.connections.values())}
        if path.startswith("/destinations/"):
            return self.destinations[path.rsplit("/", 1)[1]]
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
        if path.startswith("/jobs/"):
            return self.jobs[int(path.rsplit("/", 1)[1])]
        raise KeyError(f"unhandled fake route: {method} {path}")


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
        raise exc.PyAirbyteInputError(
            message="Destination configuration has no warehouse path to open.",
            context={"keys": sorted(destination_configuration)},
        )
    schema = destination_configuration.get("schema_name", "airbyte_raw")
    return SparkCache(
        get_spark(), str(path), schema_name=schema, table_prefix=table_prefix
    )


# -- object model ------------------------------------------------------------


@dataclass
class CloudWorkspace:
    """Handle on one hosted workspace (reference ``workspaces.py:70``)."""

    workspace_id: str
    transport: CloudTransport

    def get_connection(self, connection_id: str) -> CloudConnection:
        return CloudConnection(workspace=self, connection_id=connection_id)

    def list_connections(self) -> list[CloudConnection]:
        doc = self.transport.request(
            "GET", f"/connections?workspaceIds={self.workspace_id}"
        )
        return [
            CloudConnection(
                workspace=self,
                connection_id=row["connectionId"],
                _info=row,
            )
            for row in doc.get("data", [])
        ]


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
