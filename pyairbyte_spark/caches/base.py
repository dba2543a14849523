"""Cache base class — reference ``airbyte/caches/base.py``.

The Spark warehouse cache IS the base implementation; named warehouse
caches subclass it for constructor parity only.
"""

from __future__ import annotations

from pyairbyte_spark.cache import SparkCache

CacheBase = SparkCache

__all__ = [
    "CacheBase",
]
