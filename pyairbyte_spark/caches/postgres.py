"""Postgres-named cache — reference ``airbyte/caches/postgres.py:37``."""

from __future__ import annotations

from typing import Any

from pyairbyte_spark.cache import SparkCache
from pyairbyte_spark.caches.util import warehouse_root
from pyairbyte_spark.session import get_spark


class PostgresCache(SparkCache):
    """Reference ``PostgresCache(host, port, database, username,
    password, ...)`` — connection fields feed the JDBC read path
    (`pyairbyte_spark.jdbc`) and the destination connector."""

    def __init__(
        self,
        *,
        host: str = "localhost",
        port: int = 5432,
        database: str = "postgres",
        username: str = "postgres",
        password: str = "",
        schema_name: str = "public",
        spark=None,
        **kwargs: Any,
    ) -> None:
        self.connection_config = {
            "type": "postgres",
            "host": host,
            "port": port,
            "database": database,
            "username": username,
            "password": password,
            "schema": schema_name,
        }
        super().__init__(
            spark or get_spark(),
            warehouse_root("postgres", f"{host}_{port}", database, schema_name),
            schema_name=schema_name,
            **kwargs,
        )


PostgresConfig = PostgresCache

__all__ = [
    "PostgresCache",
    "PostgresConfig",
]
