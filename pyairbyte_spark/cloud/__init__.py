"""Hosted-workspace ("Cloud") APIs — reference
``airbyte/cloud/__init__.py:110-130`` export surface.

Single implementation in ``_core.py`` (transport protocol + HTTP and
offline-fake transports, credentials resolution + token exchange,
workspace/connector/connection/sync-result/organization handles,
custom declarative source definitions); the named submodules mirror
the reference layout, and :mod:`client`/:mod:`client_config`/
:mod:`models` add the reference's public client surface.
"""

from __future__ import annotations

from pyairbyte_spark.cloud import (
    client,
    client_config,
    connections,
    constants,
    organizations,
    sync_results,
    workspaces,
)
from pyairbyte_spark.cloud._core import (  # noqa: F401
    CLOUD_API_URL_ENV,
    CLOUD_BEARER_TOKEN_ENV,
    CLOUD_CLIENT_ID_ENV,
    CLOUD_CLIENT_SECRET_ENV,
    CLOUD_WORKSPACE_ID_ENV,
    DEFAULT_API_ROOT,
    CheckResult,
    CloudConnection,
    CloudConnector,
    CloudCredentials,
    CloudDestination,
    CloudError,
    CloudOrganization,
    CloudSource,
    CloudTransport,
    CloudWorkspace,
    ConnectionSyncError,
    ConnectionSyncTimeoutError,
    CustomCloudSourceDefinition,
    FakeCloudTransport,
    HttpTransport,
    SyncResult,
    destination_to_cache,
    exchange_client_credentials,
    resolve_cloud_credentials,
)
from pyairbyte_spark.cloud.client import CloudClient
from pyairbyte_spark.cloud.client_config import CloudClientConfig
from pyairbyte_spark.cloud.models import (
    CloudWorkspaceInfo,
    JobStatusEnum,
    JobTypeEnum,
)

__all__ = [
    # Submodules
    "workspaces",
    "client",
    "organizations",
    "connections",
    "constants",
    "client_config",
    "sync_results",
    # Classes
    "CloudClient",
    "CloudOrganization",
    "CloudWorkspace",
    "CloudConnection",
    "CloudClientConfig",
    "CloudWorkspaceInfo",
    "SyncResult",
    # Enums
    "JobStatusEnum",
    "JobTypeEnum",
    # Engine-side surface (transports, credentials, errors)
    "CloudCredentials",
    "CloudError",
    "CloudTransport",
    "ConnectionSyncError",
    "ConnectionSyncTimeoutError",
    "FakeCloudTransport",
    "HttpTransport",
    "destination_to_cache",
    "exchange_client_credentials",
    "resolve_cloud_credentials",
]
