"""Organization APIs — reference ``airbyte/cloud/organizations.py``."""

from __future__ import annotations

from pyairbyte_spark.cloud._core import CloudOrganization  # noqa: F401

__all__ = [
    "CloudOrganization",
]
