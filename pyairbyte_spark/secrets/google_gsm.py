"""Google Secret Manager (GSM) integration — reference
``airbyte/secrets/google_gsm.py:75-260``.

The GSM client library is optional; the class imports cleanly anywhere
and raises a structured error at construction when
``google-cloud-secret-manager`` is absent (this container has no GCP
SDK, so tests exercise the credential-resolution logic with an
injected fake client).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import TYPE_CHECKING, Any, Iterable

from pyairbyte_spark import exceptions as exc
from pyairbyte_spark.secrets._core import (
    CustomSecretManager,
    SecretHandle,
    SecretSourceEnum,
    SecretString,
)

if TYPE_CHECKING:  # pragma: no cover
    pass


class GSMSecretHandle(SecretHandle):
    """Secret handle that can inspect GSM labels (reference
    ``google_gsm.py:41-72``)."""

    parent: "GoogleGSMSecretManager"

    def _get_gsm_secret_object(self) -> Any:
        return self.parent.secret_client.get_secret(name=self.secret_name.split("/versions/")[0])

    @property
    def labels(self) -> dict[str, str]:
        return dict(self._get_gsm_secret_object().labels)


class GoogleGSMSecretManager(CustomSecretManager):
    """Retrieves secrets from Google Secret Manager. Not enabled by
    default — instantiate with a project + service-account credentials
    (path or JSON; falls back to GOOGLE_APPLICATION_CREDENTIALS /
    GCP_GSM_CREDENTIALS env vars, reference ``google_gsm.py:97-150``).

    ``secret_client`` may be injected for testing (duck-typed subset of
    ``SecretManagerServiceClient``: access_secret_version, list_secrets,
    get_secret).
    """

    name = SecretSourceEnum.GOOGLE_GSM.value
    auto_register = False
    as_backup = False
    replace_existing = False

    CONNECTOR_LABEL = "connector"
    """Label key used to filter secrets by connector name."""

    def __init__(
        self,
        project: str,
        *,
        credentials_path: str | None = None,
        credentials_json: str | SecretString | None = None,
        auto_register: bool = False,
        as_backup: bool = False,
        secret_client: Any | None = None,
    ) -> None:
        if credentials_path and credentials_json:
            raise exc.PyAirbyteInputError(
                guidance="You can provide `credentials_path` or `credentials_json` but not both.",
            )
        self.project = project
        if credentials_json is not None and not isinstance(credentials_json, SecretString):
            credentials_json = SecretString(credentials_json)
        if not credentials_json and not credentials_path:
            if "GOOGLE_APPLICATION_CREDENTIALS" in os.environ:
                credentials_path = os.environ["GOOGLE_APPLICATION_CREDENTIALS"]
            elif "GCP_GSM_CREDENTIALS" in os.environ:
                credentials_json = SecretString(os.environ["GCP_GSM_CREDENTIALS"])
        if credentials_path:
            credentials_json = SecretString(
                Path(credentials_path).read_text(encoding="utf-8")
            )
        if secret_client is not None:
            self.secret_client = secret_client
        else:
            if not credentials_json:
                raise exc.PyAirbyteInputError(
                    guidance=(
                        "No Google Cloud credentials found. Provide `credentials_path`, "
                        "`credentials_json`, or the GOOGLE_APPLICATION_CREDENTIALS / "
                        "GCP_GSM_CREDENTIALS environment variables."
                    ),
                )
            try:
                from google.cloud import secretmanager  # type: ignore
            except ImportError as ex:  # pragma: no cover - no GCP SDK here
                raise exc.PyAirbyteImportError(
                    message="google-cloud-secret-manager is required for GSM secrets.",
                    guidance="pip install airbyte[gsm] equivalent: google-cloud-secret-manager",
                ) from ex
            self.secret_client = (
                secretmanager.SecretManagerServiceClient.from_service_account_info(
                    json.loads(credentials_json)
                )
            )
        if auto_register:
            self.auto_register = auto_register
        if as_backup:
            self.as_backup = as_backup
        super().__init__()

    def _fully_qualified_secret_name(self, secret_name: str) -> str:
        full_name = secret_name
        if "projects/" not in full_name:
            full_name = f"projects/{self.project}/secrets/{secret_name}/versions/latest"
        if "/versions/" not in full_name:
            full_name += "/versions/latest"
        return full_name

    def get_secret(self, secret_name: str) -> SecretString | None:
        try:
            return SecretString(
                self.secret_client.access_secret_version(
                    name=self._fully_qualified_secret_name(secret_name)
                ).payload.data.decode("UTF-8")
            )
        except Exception:  # noqa: BLE001 - not found: fall through
            return None

    def get_secret_handle(self, secret_name: str) -> GSMSecretHandle:
        return GSMSecretHandle(
            parent=self,
            secret_name=self._fully_qualified_secret_name(secret_name),
        )

    def fetch_secrets(self, *, filter_string: str) -> Iterable[GSMSecretHandle]:
        """List matching secrets (reference ``google_gsm.py:198-230``);
        e.g. ``labels.connector=source-github``."""
        pager = self.secret_client.list_secrets(
            request={"filter": filter_string, "parent": f"projects/{self.project}"}
        )
        return [GSMSecretHandle(parent=self, secret_name=s.name) for s in pager]

    def fetch_secrets_by_label(
        self, label_key: str, label_value: str
    ) -> Iterable[GSMSecretHandle]:
        return self.fetch_secrets(filter_string=f"labels.{label_key}={label_value}")

    def fetch_connector_secrets(self, connector_name: str) -> Iterable[GSMSecretHandle]:
        return self.fetch_secrets_by_label(self.CONNECTOR_LABEL, connector_name)


__all__ = [
    "GSMSecretHandle",
    "GoogleGSMSecretManager",
]
