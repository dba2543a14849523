"""Offline-safe URL fetch with an on-disk cache.

The reference pulls its connector registry and YAML manifests from the
network at import/use time (``airbyte/registry.py:35-149``,
``airbyte/_executors/util.py:42-120``). This helper gives the same
capability a degraded-gracefully shape:

- every successful fetch is cached on disk (keyed by URL hash), so a
  later offline run serves the cached copy;
- ``PYAIRBYTE_OFFLINE=1`` (or ``offline=True``) forbids network use:
  cached content is served, anything uncached raises with a clear
  message instead of hanging on a dead socket;
- a failed online fetch falls back to the cache when one exists.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import urllib.request
from dataclasses import dataclass

from pyairbyte_spark import exceptions as exc

OFFLINE_ENV = "PYAIRBYTE_OFFLINE"
CACHE_DIR_ENV = "PYAIRBYTE_FETCH_CACHE_DIR"


@dataclass(kw_only=True)
class FetchError(exc.PyAirbyteError):
    """A remote document could not be fetched (and no cache exists)."""


def _is_offline(offline: bool | None) -> bool:
    if offline is not None:
        return offline
    return os.environ.get(OFFLINE_ENV, "").lower() in ("1", "true", "yes")


def _cache_dir() -> str:
    return os.environ.get(CACHE_DIR_ENV) or os.path.join(
        tempfile.gettempdir(), "pyairbyte-spark-fetch-cache"
    )


def _cache_path(url: str) -> str:
    return os.path.join(
        _cache_dir(), hashlib.sha256(url.encode()).hexdigest()[:24] + ".cache"
    )


def fetch_text(
    url: str, *, offline: bool | None = None, timeout: float = 30.0
) -> str:
    """GET ``url`` as text, cache-through on disk.

    Online: fetch, refresh the cache, fall back to a cached copy on
    failure. Offline: cached copy or :class:`FetchError` — never a
    network call.
    """
    path = _cache_path(url)
    if _is_offline(offline):
        try:
            with open(path, encoding="utf-8") as f:
                return f.read()
        except OSError as ex:
            raise FetchError(
                message="Offline mode and no cached copy of this URL.",
                context={"url": url, "cache_path": path},
            ) from ex
    try:
        req = urllib.request.Request(url, headers={"Accept": "*/*"})
        with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
            text = resp.read().decode("utf-8")
    except Exception as ex:  # noqa: BLE001 - any transport failure → cache fallback
        try:
            with open(path, encoding="utf-8") as f:
                return f.read()
        except OSError:
            raise FetchError(
                message="Fetch failed and no cached copy exists.",
                context={"url": url, "error": str(ex)},
            ) from ex
    os.makedirs(_cache_dir(), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=_cache_dir(), suffix=".tmp")
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        f.write(text)
    os.replace(tmp, path)
    return text
