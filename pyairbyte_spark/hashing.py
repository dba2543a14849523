"""One-way hashing for config/state identity.

The reference derives a stable one-way hash from arbitrary nested
config objects to key telemetry and state-scope identity without
storing secrets (``airbyte/_util/hashing.py``, used at
``airbyte/shared/sql_processor.py:147-167``). Same capability here:
a deterministic, order-insensitive digest over nested mappings.

For column data (not configs) use the JVM-side expression instead:
``sha256_expr`` — no Python in the hot path.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Mapping
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

_DOMAIN_SEED = "pyairbyte_spark:"


def _canonical(obj: Any) -> Any:
    """Reduce nested objects to a canonical JSON-serializable form:
    mappings sorted by key, everything non-JSON stringified."""
    if isinstance(obj, Mapping):
        return {str(k): _canonical(obj[k]) for k in sorted(obj, key=str)}
    if isinstance(obj, (list, tuple)):
        return [_canonical(x) for x in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)


def one_way_hash(obj: Any) -> str:
    """Stable sha256 hex digest of any (nested) config object.

    Deterministic across processes and key order; domain-seeded so the
    digests can't be matched against plain sha256 rainbow tables.
    """
    payload = json.dumps(_canonical(obj), separators=(",", ":"), sort_keys=True)
    return hashlib.sha256((_DOMAIN_SEED + payload).encode()).hexdigest()


def sha256_expr(*cols: Column | str) -> Column:
    """JVM-side row hash over one or more columns (null-safe concat)."""
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.sha2(
        F.concat_ws("\x1f", *[c.cast("string") for c in parts]), 256
    )
