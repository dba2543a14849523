"""Named cache classes mirroring the reference's ``airbyte.caches``.

Reference surface: ``airbyte/caches/__init__.py:23-42`` (exports),
``duckdb.py:46``, ``bigquery.py:38``, ``snowflake.py:74``,
``postgres.py:37``, ``motherduck.py:71``.

Every cache here IS the Spark parquet warehouse. The reference needs a
separate SQL processor + bulk loader per external warehouse (SURVEY §2
S7-S9); Spark's writers already land data in parallel, so these classes
exist for *constructor parity* — reference code like::

    from pyairbyte_spark.caches import DuckDBCache
    cache = DuckDBCache(db_path="/tmp/mydb.duckdb", schema_name="main")

ports unchanged. Each class roots its warehouse at a deterministic
location derived from the reference's own config fields and keeps the
connection fields on ``self.connection_config`` so the JDBC read path
(`pyairbyte_spark.jdbc`) and the destination connectors
(`pyairbyte_spark.destinations`) can reach the real external warehouse
when one exists. Pushing tables INTO the external warehouse is the
reverse-ETL path (``SparkDestination``), exactly as in the reference's
cache→destination pairing.
"""

from __future__ import annotations

from pyairbyte_spark.caches import (
    base,
    bigquery,
    duckdb,
    motherduck,
    postgres,
    snowflake,
    util,
)
from pyairbyte_spark.caches.base import CacheBase
from pyairbyte_spark.caches.bigquery import BigQueryCache
from pyairbyte_spark.caches.duckdb import DuckDBCache
from pyairbyte_spark.caches.motherduck import MotherDuckCache
from pyairbyte_spark.caches.postgres import PostgresCache
from pyairbyte_spark.caches.snowflake import SnowflakeCache
from pyairbyte_spark.caches.util import get_default_cache, new_local_cache
from pyairbyte_spark.cache import SparkCache

__all__ = [
    # Factories
    "get_default_cache",
    "new_local_cache",
    # Classes
    "BigQueryCache",
    "CacheBase",
    "DuckDBCache",
    "MotherDuckCache",
    "PostgresCache",
    "SnowflakeCache",
    "SparkCache",
    # Submodules
    "util",
    "bigquery",
    "duckdb",
    "motherduck",
    "postgres",
    "snowflake",
    "base",
]
