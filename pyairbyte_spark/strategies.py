"""Write strategies and their resolution.

Parity with the reference's ``WriteStrategy``/``WriteMethod`` decision
tree (``airbyte/strategies.py:18-92``) and
``catalog_providers.py:183-208``: AUTO resolves to MERGE when the
stream has primary keys, APPEND when it has a cursor field, else
REPLACE.
"""

from __future__ import annotations

import enum


class WriteStrategy(str, enum.Enum):
    MERGE = "merge"
    APPEND = "append"
    REPLACE = "replace"
    AUTO = "auto"


class WriteMethod(str, enum.Enum):
    MERGE = "merge"
    APPEND = "append"
    REPLACE = "replace"


class DestinationSyncMode(str, enum.Enum):
    """Airbyte-protocol destination sync modes (reference strategies.py:79-92)."""

    APPEND = "append"
    APPEND_DEDUP = "append_dedup"
    OVERWRITE = "overwrite"


def resolve_write_method(
    strategy: WriteStrategy,
    *,
    has_primary_keys: bool,
    has_cursor: bool,
) -> WriteMethod:
    if strategy == WriteStrategy.MERGE:
        if not has_primary_keys:
            raise ValueError("MERGE strategy requires primary keys")
        return WriteMethod.MERGE
    if strategy == WriteStrategy.APPEND:
        return WriteMethod.APPEND
    if strategy == WriteStrategy.REPLACE:
        return WriteMethod.REPLACE
    # AUTO (reference catalog_providers.py:183-208)
    if has_primary_keys:
        return WriteMethod.MERGE
    if has_cursor:
        return WriteMethod.APPEND
    return WriteMethod.REPLACE


def to_destination_sync_mode(method: WriteMethod) -> DestinationSyncMode:
    return {
        WriteMethod.MERGE: DestinationSyncMode.APPEND_DEDUP,
        WriteMethod.APPEND: DestinationSyncMode.APPEND,
        WriteMethod.REPLACE: DestinationSyncMode.OVERWRITE,
    }[method]
