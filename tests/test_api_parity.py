"""Module-level API parity with the reference package layout.

A user switching from the reference should be able to keep every
import path: top-level names, and the per-package export surfaces of
sources / destinations / secrets / cloud / caches / datasets /
documents (reference ``airbyte/*/__init__.py`` ``__all__`` lists,
snapshotted here so the check runs without the reference checkout).
"""

from __future__ import annotations

import importlib

import pytest

REFERENCE_SURFACES = {
    "sources": [
        "base", "registry", "util", "get_source", "get_benchmark_source",
        "get_available_connectors", "get_connector_metadata",
        "ConnectorMetadata", "Source",
    ],
    "destinations": [
        "util", "get_destination", "get_noop_destination", "Destination",
    ],
    "secrets": [
        "base", "config", "custom", "env_vars", "google_colab",
        "google_gsm", "prompt", "util", "get_secret", "SecretSourceEnum",
        "SecretString", "SecretHandle", "SecretManager",
        "EnvVarSecretManager", "DotenvSecretManager", "ColabSecretManager",
        "SecretsPrompt", "CustomSecretManager", "GoogleGSMSecretManager",
        "register_secret_manager", "clear_secret_sources",
        "disable_secret_source",
    ],
    "cloud": [
        "workspaces", "client", "organizations", "connections",
        "constants", "client_config", "sync_results", "CloudClient",
        "CloudOrganization", "CloudWorkspace", "CloudConnection",
        "CloudClientConfig", "CloudWorkspaceInfo", "SyncResult",
        "JobStatusEnum", "JobTypeEnum",
    ],
    "caches": [
        "get_default_cache", "new_local_cache", "BigQueryCache",
        "CacheBase", "DuckDBCache", "MotherDuckCache", "PostgresCache",
        "SnowflakeCache", "util", "bigquery", "duckdb", "motherduck",
        "postgres", "snowflake", "base",
    ],
    "datasets": ["CachedDataset", "DatasetBase", "DatasetMap", "SQLDataset"],
    "documents": ["Document"],
}


@pytest.mark.parametrize("module", sorted(REFERENCE_SURFACES))
def test_submodule_surface(module):
    mod = importlib.import_module(f"pyairbyte_spark.{module}")
    missing = [n for n in REFERENCE_SURFACES[module] if not hasattr(mod, n)]
    assert not missing, f"pyairbyte_spark.{module} missing {missing}"


def test_deep_import_paths_work():
    """Spot-check the import paths reference users actually write."""
    from pyairbyte_spark.caches.duckdb import DuckDBCache  # noqa: F401
    from pyairbyte_spark.cloud.client import CloudClient  # noqa: F401
    from pyairbyte_spark.cloud.constants import FINAL_STATUSES
    from pyairbyte_spark.cloud.models import JobStatusEnum
    from pyairbyte_spark.destinations.util import get_noop_destination  # noqa: F401
    from pyairbyte_spark.secrets.base import SecretString  # noqa: F401
    from pyairbyte_spark.secrets.util import get_secret  # noqa: F401
    from pyairbyte_spark.sources.util import get_source  # noqa: F401

    assert JobStatusEnum.SUCCEEDED in FINAL_STATUSES


def test_noop_destination_consumes_and_confirms_state(spark, tmp_path):
    """The dev-null destination passes records through and echoes STATE
    confirmations without writing anything (benchmarking contract)."""
    from pyairbyte_spark import SparkCache
    from pyairbyte_spark.destinations import get_noop_destination
    from pyairbyte_spark.sources import SourceFaker

    cache = SparkCache(spark, str(tmp_path / "wh"))
    SourceFaker(seed=1234, count=50).read(cache, write_strategy="replace")
    dest = get_noop_destination()
    result = dest.write(cache, streams=["users"])
    assert result is not None
