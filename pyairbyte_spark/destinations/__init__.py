"""Destination connectors (reverse ETL) — reference
``airbyte/destinations/__init__.py`` exports Destination,
get_destination, get_noop_destination and the util submodule; the
implementation lives in ``base.py`` (paths A/B/C, state channels,
streaming + distributed delivery).
"""

from __future__ import annotations

from pyairbyte_spark.destinations import util
from pyairbyte_spark.destinations.base import SparkDestination
from pyairbyte_spark.destinations.util import get_destination, get_noop_destination

Destination = SparkDestination

__all__ = [
    # Submodules
    "util",
    # Factories
    "get_destination",
    "get_noop_destination",
    # Classes
    "Destination",
    "SparkDestination",
]
