"""Cloud constants — reference ``airbyte/cloud/constants.py``."""

from __future__ import annotations

from pyairbyte_spark.cloud._core import (  # noqa: F401
    CLOUD_API_URL_ENV,
    CLOUD_BEARER_TOKEN_ENV,
    CLOUD_CLIENT_ID_ENV,
    CLOUD_CLIENT_SECRET_ENV,
    CLOUD_WORKSPACE_ID_ENV,
    DEFAULT_API_ROOT,
)
from pyairbyte_spark.cloud.models import JobStatusEnum

FINAL_STATUSES: set[JobStatusEnum] = {
    JobStatusEnum.SUCCEEDED,
    JobStatusEnum.FAILED,
    JobStatusEnum.CANCELLED,
}
"""Statuses that indicate a sync job has completed."""

FAILED_STATUSES: set[JobStatusEnum] = {
    JobStatusEnum.FAILED,
    JobStatusEnum.CANCELLED,
}
"""Statuses that indicate a sync job has failed."""

READABLE_DESTINATION_TYPES: set[str] = {
    "bigquery",
    "snowflake",
}
"""Hosted destination types whose synced data the engine can read back
(via ``destination_to_cache`` → JDBC/warehouse mapping)."""

__all__ = [
    "FAILED_STATUSES",
    "FINAL_STATUSES",
    "READABLE_DESTINATION_TYPES",
    "DEFAULT_API_ROOT",
]
