"""Google Colab user-secrets manager — reference
``airbyte/secrets/google_colab.py:9-37``."""

from __future__ import annotations

from pyairbyte_spark.secrets._core import (
    SecretManager,
    SecretSourceEnum,
    SecretString,
)


class ColabSecretManager(SecretManager):
    """Retrieves secrets from Google Colab user secrets; outside Colab
    (no ``google.colab`` module) every lookup returns None so the
    chained secret sources fall through, exactly as the reference does.
    """

    name = SecretSourceEnum.GOOGLE_COLAB.value

    def __init__(self) -> None:
        try:
            from google.colab import userdata as colab_userdata  # type: ignore

            self.colab_userdata = colab_userdata
        except ImportError:
            self.colab_userdata = None
        super().__init__()

    def get_secret(self, secret_name: str) -> SecretString | None:
        if self.colab_userdata is None:
            return None
        try:
            return SecretString(self.colab_userdata.get(secret_name))
        except Exception:  # noqa: BLE001 - name not found: fall through
            return None


__all__ = [
    "ColabSecretManager",
]
