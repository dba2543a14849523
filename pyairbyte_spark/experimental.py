"""Experimental features which may change.

Reference surface: ``airbyte/experimental/__init__.py`` — historically
the home of docker/yaml sources before they stabilized into
``get_source(docker_image=..., source_manifest=...)``; today it
re-exports ``get_source`` only, and so does this module.
"""

from __future__ import annotations

from pyairbyte_spark.factories import get_source

__all__ = [
    "get_source",
]
