"""BigQuery-named cache — reference ``airbyte/caches/bigquery.py:38``."""

from __future__ import annotations

from typing import Any

from pyairbyte_spark.cache import SparkCache
from pyairbyte_spark.caches.util import warehouse_root
from pyairbyte_spark.session import get_spark


class BigQueryCache(SparkCache):
    """Reference ``BigQueryCache(project_name, dataset_name,
    credentials_path)`` — note BigQuery has no schema: the dataset IS
    the namespace (reference ``bigquery.py:30-36``)."""

    def __init__(
        self,
        *,
        project_name: str = "",
        dataset_name: str = "airbyte_raw",
        credentials_path: str | None = None,
        spark=None,
        **kwargs: Any,
    ) -> None:
        self.connection_config = {
            "type": "bigquery",
            "project_id": project_name,
            "dataset_id": dataset_name,
            "credentials_json": credentials_path,
        }
        super().__init__(
            spark or get_spark(),
            warehouse_root("bigquery", project_name, dataset_name),
            schema_name=dataset_name,
            **kwargs,
        )


BigQueryConfig = BigQueryCache

__all__ = [
    "BigQueryCache",
    "BigQueryConfig",
]
