"""Public cloud API models — reference ``airbyte/cloud/models.py``."""

from __future__ import annotations

from collections.abc import Mapping
from dataclasses import dataclass, field
from enum import Enum
from typing import Any


class JobStatusEnum(str, Enum):
    """Status values for a hosted sync job (reference ``models.py:57``)."""

    PENDING = "pending"
    RUNNING = "running"
    INCOMPLETE = "incomplete"
    FAILED = "failed"
    SUCCEEDED = "succeeded"
    CANCELLED = "cancelled"


class JobTypeEnum(str, Enum):
    """Job type values (reference ``models.py:68``)."""

    SYNC = "sync"
    RESET = "reset"
    REFRESH = "refresh"
    CLEAR = "clear"


@dataclass
class CloudWorkspaceInfo:
    """Workspace metadata (reference ``models.py:77``); accepts both
    snake_case and the API's camelCase keys via ``from_mapping``."""

    workspace_id: str
    name: str
    data_residency: str | None = None
    organization_id: str | None = None
    notifications: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_mapping(cls, workspace: Mapping[str, Any]) -> "CloudWorkspaceInfo":
        def pick(*keys: str, default: Any = None) -> Any:
            for k in keys:
                if k in workspace:
                    return workspace[k]
            return default

        return cls(
            workspace_id=str(pick("workspace_id", "workspaceId", default="")),
            name=str(pick("name", default="")),
            data_residency=pick("data_residency", "dataResidency"),
            organization_id=pick("organization_id", "organizationId"),
            notifications=dict(pick("notifications", default={}) or {}),
        )


__all__ = [
    "CloudWorkspaceInfo",
    "JobStatusEnum",
    "JobTypeEnum",
]
