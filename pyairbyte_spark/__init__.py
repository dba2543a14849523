"""pyairbyte_spark — a PySpark-native analytics/ELT engine.

A from-scratch engine with the query and data-processing capabilities of
airbytehq/PyAirbyte (the reference), re-expressed Spark-first:

- record streams land in a Spark-managed warehouse (parquet tables),
- write strategies (append / replace / merge / auto) are DataFrame plans,
- incremental sync state is a small state table with buffer-then-finalize
  commit ordering,
- the dataset query surface is plain lazy DataFrames + a guarded SQL
  passthrough,
- plus large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal plumbing) the reference does not have.

Everything here derives from public knowledge only: the Apache Spark API
and the reference repo's observable behavior (cited as ``path:line``
relative to the reference checkout).
"""

from pyairbyte_spark import (
    callbacks,
    cloud,
    constants,
    datasets,
    destinations,
    documents,
    exceptions,
    jdbc,
    logs,
    records,
    registry,
    results,
    secrets,
    sources,
)
from pyairbyte_spark import caches, cli, experimental, mcp
from pyairbyte_spark.cache import SparkCache
from pyairbyte_spark.datasets import CachedDataset, SQLDataset
from pyairbyte_spark.destinations import SparkDestination
from pyairbyte_spark.factories import (
    get_colab_cache,
    get_default_cache,
    get_destination,
    get_source,
    new_local_cache,
)
from pyairbyte_spark.caches import BigQueryCache, DuckDBCache
from pyairbyte_spark.records import StreamRecord
from pyairbyte_spark.results import WriteResult
from pyairbyte_spark.registry import get_available_connectors
from pyairbyte_spark.results import ReadResult
from pyairbyte_spark.secrets import SecretSourceEnum, get_secret
from pyairbyte_spark.session import get_spark
from pyairbyte_spark.sources import SparkSource
from pyairbyte_spark.strategies import WriteStrategy

# Reference-name aliases: code written against the reference's
# `from airbyte import Source, Destination` ports unchanged.
Source = SparkSource
Destination = SparkDestination

__all__ = [
    # Modules (reference airbyte/__init__.py __all__ parity)
    "caches",
    "callbacks",
    "cli",
    "cloud",
    "experimental",
    "mcp",
    "constants",
    "datasets",
    "destinations",
    "documents",
    "exceptions",
    "jdbc",
    "logs",
    "records",
    "registry",
    "results",
    "secrets",
    "sources",
    # Factories
    "get_available_connectors",
    "get_colab_cache",
    "get_default_cache",
    "get_destination",
    "get_secret",
    "get_source",
    "get_spark",
    "new_local_cache",
    # Classes
    "BigQueryCache",
    "CachedDataset",
    "Destination",
    "DuckDBCache",
    "ReadResult",
    "SQLDataset",
    "SecretSourceEnum",
    "Source",
    "SparkCache",
    "SparkDestination",
    "SparkSource",
    "StreamRecord",
    "WriteResult",
    "WriteStrategy",
]
