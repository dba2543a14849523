"""Engine-wide constants.

Parity notes reference airbytehq/PyAirbyte (``/root/reference``):
metadata column names from ``airbyte/constants.py:16-40``; batch sizing
from ``airbyte/_writers/file_writers.py:33`` and
``airbyte/constants.py`` (DEFAULT_ARROW_MAX_CHUNK_SIZE).
"""

from __future__ import annotations

# Internal metadata columns added to every landed record.
AB_RAW_ID_COLUMN = "_airbyte_raw_id"
AB_EXTRACTED_AT_COLUMN = "_airbyte_extracted_at"
AB_META_COLUMN = "_airbyte_meta"

AB_INTERNAL_COLUMNS = (
    AB_RAW_ID_COLUMN,
    AB_EXTRACTED_AT_COLUMN,
    AB_META_COLUMN,
)

# Ingest micro-batch size (records per batch file / createDataFrame call).
DEFAULT_BATCH_SIZE = 100_000

# Arrow export chunk size.
DEFAULT_ARROW_MAX_CHUNK_SIZE = 100_000

# Pseudo-stream names used for non-STREAM state artifacts
# (reference: airbyte/caches/_state_backend.py:34-36).
GLOBAL_STATE_STREAM = "_GLOBAL"
LEGACY_STATE_STREAM = "_LEGACY"

# Internal metadata table names (reference: airbyte/caches/base.py:45-112).
STREAMS_TABLE = "_airbyte_streams"
STATE_TABLE = "_airbyte_state"
DESTINATION_STATE_TABLE = "_airbyte_destination_state"

DEFAULT_CACHE_SCHEMA = "airbyte_raw"
