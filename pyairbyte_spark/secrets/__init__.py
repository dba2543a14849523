"""Secrets management — reference ``airbyte/secrets/__init__.py:119-150``.

Single implementation in ``_core.py``; the named submodules (base,
config, custom, env_vars, google_colab, google_gsm, prompt, util)
mirror the reference's package layout so imports like
``from pyairbyte_spark.secrets.util import get_secret`` port unchanged.
"""

from __future__ import annotations

from pyairbyte_spark.secrets import (
    base,
    config,
    custom,
    env_vars,
    google_colab,
    google_gsm,
    prompt,
    util,
)
from pyairbyte_spark.secrets._core import (  # noqa: F401
    _SECRETS_SOURCES,  # tests/fixtures mutate the registry in place
)
from pyairbyte_spark.secrets._core import (
    CustomSecretManager,
    DotenvSecretManager,
    EnvVarSecretManager,
    SecretHandle,
    SecretManager,
    SecretSourceEnum,
    SecretString,
    SecretsPrompt,
    clear_secret_sources,
    deep_update,
    disable_secret_source,
    get_secret,
    hydrate_secrets,
    is_secret_available,
    register_secret_manager,
    try_get_secret,
)
from pyairbyte_spark.secrets.google_colab import ColabSecretManager
from pyairbyte_spark.secrets.google_gsm import GoogleGSMSecretManager

__all__ = [
    # Submodules
    "base",
    "config",
    "custom",
    "env_vars",
    "google_colab",
    "google_gsm",
    "prompt",
    "util",
    # Secret access
    "get_secret",
    "try_get_secret",
    "is_secret_available",
    "hydrate_secrets",
    "deep_update",
    # Secret classes
    "SecretSourceEnum",
    "SecretString",
    "SecretHandle",
    # Secret managers
    "SecretManager",
    "EnvVarSecretManager",
    "DotenvSecretManager",
    "ColabSecretManager",
    "SecretsPrompt",
    "CustomSecretManager",
    "GoogleGSMSecretManager",
    # Registration functions
    "register_secret_manager",
    "clear_secret_sources",
    "disable_secret_source",
]
