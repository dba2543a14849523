"""Env/dotenv secret managers — reference ``airbyte/secrets/env_vars.py``."""

from __future__ import annotations

from pyairbyte_spark.secrets._core import (  # noqa: F401
    DotenvSecretManager,
    EnvVarSecretManager,
)

__all__ = [
    "DotenvSecretManager",
    "EnvVarSecretManager",
]
