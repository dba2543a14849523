"""Cloud client configuration — reference
``airbyte/cloud/client_config.py:59-130``: exactly one of (client_id +
client_secret) or bearer_token."""

from __future__ import annotations

from dataclasses import dataclass

from pyairbyte_spark import exceptions as exc
from pyairbyte_spark.cloud._core import DEFAULT_API_ROOT
from pyairbyte_spark.secrets import SecretString


@dataclass
class CloudClientConfig:
    """Authentication + endpoint configuration for the hosted API."""

    client_id: SecretString | None = None
    client_secret: SecretString | None = None
    bearer_token: SecretString | None = None
    api_root: str = DEFAULT_API_ROOT
    config_api_root: str | None = None

    def __post_init__(self) -> None:
        if self.client_id is not None:
            self.client_id = SecretString(self.client_id)
        if self.client_secret is not None:
            self.client_secret = SecretString(self.client_secret)
        if self.bearer_token is not None:
            self.bearer_token = SecretString(self.bearer_token)
        has_client_credentials = (
            self.client_id is not None or self.client_secret is not None
        )
        has_bearer = self.bearer_token is not None
        if has_client_credentials and has_bearer:
            raise exc.PyAirbyteInputError(
                message="Provide client credentials OR a bearer token, not both.",
            )
        if has_client_credentials and not (self.client_id and self.client_secret):
            raise exc.PyAirbyteInputError(
                message="Both client_id and client_secret are required together.",
            )
        if not has_client_credentials and not has_bearer:
            raise exc.PyAirbyteInputError(
                message="No credentials: provide client_id+client_secret or bearer_token.",
            )


__all__ = [
    "CloudClientConfig",
]
