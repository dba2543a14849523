"""Source connectors — reference ``airbyte/sources/__init__.py:29-46``
export surface (submodules base/registry/util, factories, metadata
helpers, and the Source class)."""

from pyairbyte_spark import registry
from pyairbyte_spark.registry import (
    ConnectorMetadata,
    get_available_connectors,
    get_connector_metadata,
)
from pyairbyte_spark.sources import base, util
from pyairbyte_spark.sources.base import SparkSource
from pyairbyte_spark.sources.benchmark import get_benchmark_source
from pyairbyte_spark.sources.faker import SourceFaker
from pyairbyte_spark.sources.fixture import SourceTestFixture
from pyairbyte_spark.sources.smoke import SmokeTestSource
from pyairbyte_spark.sources.util import get_source

Source = SparkSource

__all__ = [
    # Submodules
    "base",
    "registry",
    "util",
    # Factories
    "get_source",
    "get_benchmark_source",
    # Helper functions
    "get_available_connectors",
    "get_connector_metadata",
    # Classes
    "ConnectorMetadata",
    "SmokeTestSource",
    "Source",
    "SparkSource",
    "SourceFaker",
    "SourceTestFixture",
]
