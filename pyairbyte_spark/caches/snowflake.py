"""Snowflake-named cache — reference ``airbyte/caches/snowflake.py:74``."""

from __future__ import annotations

from typing import Any

from pyairbyte_spark.cache import SparkCache
from pyairbyte_spark.caches.util import warehouse_root
from pyairbyte_spark.session import get_spark


class SnowflakeCache(SparkCache):
    """Reference ``SnowflakeCache(account, username, password, database,
    warehouse, role, ...)``. The reference PUTs 8-way-parallel staged
    files then COPY INTOs (S8); Spark's writers are already
    task-parallel, so the bulk-load machinery is subsumed and the
    connection fields ride ``connection_config`` for reverse ETL/JDBC.
    """

    def __init__(
        self,
        *,
        account: str = "",
        username: str = "",
        password: str = "",
        database: str = "",
        warehouse: str = "",
        role: str = "",
        schema_name: str = "public",
        spark=None,
        **kwargs: Any,
    ) -> None:
        self.connection_config = {
            "type": "snowflake",
            "account": account,
            "username": username,
            "password": password,
            "database": database,
            "warehouse": warehouse,
            "role": role,
            "schema": schema_name,
        }
        super().__init__(
            spark or get_spark(),
            warehouse_root("snowflake", account, database, schema_name),
            schema_name=schema_name,
            **kwargs,
        )


SnowflakeConfig = SnowflakeCache

__all__ = [
    "SnowflakeCache",
    "SnowflakeConfig",
]
