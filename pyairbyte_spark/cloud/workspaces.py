"""Workspace APIs — reference ``airbyte/cloud/workspaces.py``."""

from __future__ import annotations

from pyairbyte_spark.cloud._core import (  # noqa: F401
    CheckResult,
    CloudDestination,
    CloudSource,
    CloudWorkspace,
    CustomCloudSourceDefinition,
)
from pyairbyte_spark.cloud.models import CloudWorkspaceInfo  # noqa: F401

__all__ = [
    "CheckResult",
    "CloudDestination",
    "CloudSource",
    "CloudWorkspace",
    "CloudWorkspaceInfo",
    "CustomCloudSourceDefinition",
]
