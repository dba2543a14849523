"""DuckDB-named cache — reference ``airbyte/caches/duckdb.py:46``.

The reference needs a DuckDB SQL processor + bulk loader; here the
data lands in the Spark parquet warehouse rooted next to the named db
file, and the connection fields ride ``connection_config`` for the
destination connector (reverse ETL) and JDBC read paths. Reference
code like ``DuckDBCache(db_path=..., schema_name=...)`` ports
unchanged.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from pyairbyte_spark.cache import SparkCache
from pyairbyte_spark.session import get_spark


class DuckDBCache(SparkCache):
    """Reference ``DuckDBCache(db_path, schema_name=...)``."""

    def __init__(
        self,
        db_path: str | Path = "./.duckdb",
        *,
        schema_name: str = "main",
        spark=None,
        **kwargs: Any,
    ) -> None:
        self.db_path = str(db_path)
        self.connection_config: dict[str, Any] = {
            "type": "duckdb",
            "destination_path": self.db_path,
            "schema": schema_name,
        }
        super().__init__(
            spark or get_spark(),
            f"{self.db_path}.spark-warehouse",
            schema_name=schema_name,
            **kwargs,
        )


DuckDBConfig = DuckDBCache  # reference exposes the config class too

__all__ = [
    "DuckDBCache",
    "DuckDBConfig",
]
