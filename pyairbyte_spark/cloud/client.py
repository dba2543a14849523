"""Authenticated hosted-API client — reference
``airbyte/cloud/client.py:25``.

Binds a :class:`~pyairbyte_spark.cloud.client_config.CloudClientConfig`
to the transport layer and hands out workspace / organization handles
that share the resolved bearer token. A ``transport`` may be injected
(e.g. ``FakeCloudTransport``) exactly as the workspace-level APIs
allow, so the full client flow is testable offline.
"""

from __future__ import annotations

from pyairbyte_spark import exceptions as exc
from pyairbyte_spark.cloud._core import (
    CloudOrganization,
    CloudTransport,
    CloudWorkspace,
    HttpTransport,
    exchange_client_credentials,
)
from pyairbyte_spark.cloud.client_config import CloudClientConfig
from pyairbyte_spark.cloud.models import CloudWorkspaceInfo
from pyairbyte_spark.secrets import SecretString


class CloudClient:
    """Authenticated client for the hosted API."""

    def __init__(
        self,
        *,
        client_id: str | SecretString | None = None,
        client_secret: str | SecretString | None = None,
        bearer_token: str | SecretString | None = None,
        public_api_root: str | None = None,
        config_api_root: str | None = None,
        workspace_id: str | None = None,
        organization_id: str | None = None,
        transport: CloudTransport | None = None,
    ) -> None:
        kwargs = {}
        if public_api_root:
            kwargs["api_root"] = public_api_root
        self.config = CloudClientConfig(
            client_id=SecretString(client_id) if client_id else None,
            client_secret=SecretString(client_secret) if client_secret else None,
            bearer_token=SecretString(bearer_token) if bearer_token else None,
            config_api_root=config_api_root,
            **kwargs,
        )
        self.workspace_id = workspace_id
        self.organization_id = organization_id
        self._transport = transport

    @property
    def client_id(self) -> SecretString | None:
        return self.config.client_id

    @property
    def client_secret(self) -> SecretString | None:
        return self.config.client_secret

    @property
    def bearer_token(self) -> SecretString | None:
        return self.config.bearer_token

    @property
    def api_root(self) -> str:
        return self.config.api_root

    def get_transport(self) -> CloudTransport:
        """The authenticated transport: injected fake, or HTTP with the
        bearer token (client credentials exchanged on first use)."""
        if self._transport is not None:
            return self._transport
        token = self.config.bearer_token
        if not token:
            bootstrap = HttpTransport(api_root=self.config.api_root)
            token = exchange_client_credentials(
                bootstrap,
                str(self.config.client_id),
                str(self.config.client_secret),
            )
        self._transport = HttpTransport(
            api_root=self.config.api_root, bearer_token=str(token)
        )
        return self._transport

    def get_workspace(self, workspace_id: str | None = None) -> CloudWorkspace:
        wid = workspace_id or self.workspace_id
        if not wid:
            raise exc.PyAirbyteInputError(message="No workspace_id provided.")
        return CloudWorkspace(workspace_id=wid, transport=self.get_transport())

    def get_organization(self, organization_id: str | None = None) -> CloudOrganization:
        oid = organization_id or self.organization_id
        if not oid:
            raise exc.PyAirbyteInputError(message="No organization_id provided.")
        return CloudOrganization(
            workspace=self.get_workspace(), organization_id=oid
        )

    def get_workspace_info(self, workspace_id: str | None = None) -> CloudWorkspaceInfo:
        ws = self.get_workspace(workspace_id)
        doc = ws._workspace_info()
        doc.setdefault("workspace_id", ws.workspace_id)
        return CloudWorkspaceInfo.from_mapping(doc)


__all__ = [
    "CloudClient",
]
