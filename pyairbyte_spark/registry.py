"""Connector registry: metadata lookup and ``get_available_connectors``.

The reference fetches a registry JSON from the network and caches it
(``airbyte/registry.py:35-262``). This container has no egress, so the
registry here is offline-first with the same lookup surface:

1. ``AIRBYTE_LOCAL_REGISTRY`` env var → path to a registry JSON document
   (the reference honors the same override, ``registry.py:141-149``);
2. ``AIRBYTE_REGISTRY_URL`` env var → remote registry JSON, fetched
   through the offline-safe cached fetcher (:mod:`pyairbyte_spark.fetch`
   — the reference's network path, ``registry.py:35-140``; the public
   OSS registry URL is :data:`REGISTRY_URL`). Unlike the reference,
   the URL must be opted into via the env var: no surprise egress from
   sandboxed or air-gapped runs, and ``PYAIRBYTE_OFFLINE=1`` serves the
   on-disk cache without touching the network;
3. a caller-supplied document via :func:`register_connectors`;
4. the built-in entries for this repo's in-process sources.

Entry shape follows the reference's ``oss_registry.json`` schema subset:
``{"sources": [{"dockerRepository": "airbyte/source-x", "dockerImageTag":
"1.2.3", "language": "python", "remoteRegistries": {"pypi": {"enabled":
true}}}], "destinations": [...]}``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from enum import Enum

from pyairbyte_spark import exceptions as exc

# The public OSS registry document (reference registry.py:38-44). Set
# AIRBYTE_REGISTRY_URL to this (or a mirror) to enable remote lookup.
REGISTRY_URL = (
    "https://connectors.airbyte.com/files/registries/v0/oss_registry.json"
)


class InstallType(str, Enum):
    """How a connector can be run (reference ``registry.py:48-66``)."""

    YAML = "yaml"
    PYTHON = "python"
    DOCKER = "docker"
    JAVA = "java"


class Language(str, Enum):
    PYTHON = InstallType.PYTHON.value
    JAVA = InstallType.JAVA.value
    MANIFEST_ONLY = "manifest-only"


@dataclass
class ConnectorMetadata:
    """Registry entry (reference ``registry.py:77-138``)."""

    name: str
    latest_available_version: str | None = None
    language: Language | None = None
    install_types: set[InstallType] = field(default_factory=set)
    # Registry entries carry "supportLevel" (certified/community/archived);
    # the interactive browser filters on it (reference
    # mcp/interactive/_shared_models.py SupportLevel).
    support_level: str | None = None

    @property
    def default_install_type(self) -> InstallType:
        # Same precedence as reference registry.py:129-138:
        # manifest-only → yaml; python wins over docker; docker last resort.
        if self.language == Language.MANIFEST_ONLY and InstallType.YAML in self.install_types:
            return InstallType.YAML
        if InstallType.PYTHON in self.install_types:
            return InstallType.PYTHON
        return InstallType.DOCKER


# Connectors runnable in-process with zero install — this repo's own
# sources (the reference similarly special-cases its bundled fixtures).
_BUILTIN_ENTRIES: dict[str, ConnectorMetadata] = {
    name: ConnectorMetadata(
        name=name,
        latest_available_version=None,
        language=Language.PYTHON,
        install_types={InstallType.PYTHON},
    )
    for name in ("source-test", "source-faker", "source-e2e-test")
}

_REGISTRY_CACHE: dict[str, ConnectorMetadata] | None = None


def _entry_to_metadata(entry: dict) -> ConnectorMetadata:
    # Mirrors reference registry.py:152-208 (language inference + install
    # type derivation from pypi enablement).
    name = entry["dockerRepository"].replace("airbyte/", "")
    language: Language | None = None
    raw_language = entry.get("language")
    if raw_language:
        try:
            language = Language(raw_language)
        except ValueError:
            language = None
    pypi_enabled = (
        entry.get("remoteRegistries", {}).get("pypi", {}).get("enabled", False)
    )
    install_types = {InstallType.DOCKER}
    if language == Language.PYTHON and pypi_enabled:
        install_types.add(InstallType.PYTHON)
    if language == Language.JAVA:
        install_types.add(InstallType.JAVA)
    if language == Language.MANIFEST_ONLY:
        install_types.add(InstallType.YAML)
    return ConnectorMetadata(
        name=name,
        latest_available_version=entry.get("dockerImageTag"),
        language=language,
        install_types=install_types,
        support_level=entry.get("supportLevel"),
    )


def _load_registry_document(doc: dict) -> dict[str, ConnectorMetadata]:
    out: dict[str, ConnectorMetadata] = {}
    for section in ("sources", "destinations"):
        for entry in doc.get(section, []):
            meta = _entry_to_metadata(entry)
            out[meta.name] = meta
    return out


def _get_registry_cache(*, force_refresh: bool = False) -> dict[str, ConnectorMetadata]:
    global _REGISTRY_CACHE
    if _REGISTRY_CACHE is not None and not force_refresh:
        return _REGISTRY_CACHE
    cache = dict(_BUILTIN_ENTRIES)
    local_path = os.environ.get("AIRBYTE_LOCAL_REGISTRY")
    registry_url = os.environ.get("AIRBYTE_REGISTRY_URL")
    if local_path:
        try:
            doc = json.loads(open(local_path, encoding="utf-8").read())
        except (OSError, json.JSONDecodeError) as ex:
            raise exc.AirbyteConnectorRegistryError(
                message="Failed to load local registry file.",
                context={"path": local_path, "error": str(ex)},
            ) from ex
        cache.update(_load_registry_document(doc))
    elif registry_url:
        from pyairbyte_spark.fetch import FetchError, fetch_text

        try:
            doc = json.loads(fetch_text(registry_url))
        except (FetchError, json.JSONDecodeError) as ex:
            raise exc.AirbyteConnectorRegistryError(
                message="Failed to fetch remote registry.",
                context={"url": registry_url, "error": str(ex)},
            ) from ex
        cache.update(_load_registry_document(doc))
    _REGISTRY_CACHE = cache
    return cache


def register_connectors(doc: dict) -> None:
    """Merge a registry JSON document into the in-memory registry — the
    injection seam standing in for the reference's network fetch."""
    _get_registry_cache().update(_load_registry_document(doc))


def get_connector_metadata(name: str) -> ConnectorMetadata:
    """Look up one connector (reference ``registry.py:262-289``) — raising,
    like the reference does when the registry has no such entry."""
    cache = _get_registry_cache()
    if name not in cache:
        raise exc.AirbyteConnectorNotRegisteredError(
            connector_name=name,
            available_connectors=sorted(cache),
        )
    return cache[name]


def get_available_connectors(
    install_type: InstallType | str | None = None,
) -> list[str]:
    """All registered connector names, alphabetical; optionally filtered by
    install type (reference ``registry.py:292-340``). With no docker daemon
    in this environment the default filter keeps python/manifest entries —
    the same degradation the reference applies when docker is absent."""
    cache = _get_registry_cache()
    if install_type is None:
        return sorted(
            name
            for name, meta in cache.items()
            if meta.language in {Language.PYTHON, Language.MANIFEST_ONLY}
        )
    if not isinstance(install_type, InstallType):
        install_type = InstallType(install_type)
    return sorted(
        name for name, meta in cache.items() if install_type in meta.install_types
    )
