"""MotherDuck-named cache — reference ``airbyte/caches/motherduck.py:71``."""

from __future__ import annotations

from typing import Any

from pyairbyte_spark.caches.duckdb import DuckDBCache
from pyairbyte_spark.caches.util import warehouse_root


class MotherDuckCache(DuckDBCache):
    """Reference ``MotherDuckCache(database, api_key, ...)`` — local
    Spark warehouse keyed by the MotherDuck database name; the api key
    rides ``connection_config`` for the destination connector."""

    def __init__(
        self,
        *,
        database: str = "my_db",
        api_key: str = "",
        schema_name: str = "main",
        spark=None,
        **kwargs: Any,
    ) -> None:
        super().__init__(
            db_path=warehouse_root("motherduck", database),
            schema_name=schema_name,
            spark=spark,
            **kwargs,
        )
        self.connection_config = {
            "type": "motherduck",
            "destination_path": f"md:{database}",
            "motherduck_api_key": api_key,
            "schema": schema_name,
        }


MotherDuckConfig = MotherDuckCache

__all__ = [
    "MotherDuckCache",
    "MotherDuckConfig",
]
