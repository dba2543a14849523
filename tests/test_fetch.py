"""Offline-safe fetch + remote registry / manifest resolution, against
a local HTTP fixture server (no real egress)."""

from __future__ import annotations

import http.server
import json
import threading

import pytest

from pyairbyte_spark.fetch import CACHE_DIR_ENV, OFFLINE_ENV, FetchError, fetch_text


@pytest.fixture()
def http_fixture():
    docs: dict[str, object] = {}
    hits: list[str] = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(self.path)
            if self.path not in docs:
                self.send_error(404)
                return
            body = json.dumps(docs[self.path]).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    server = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        yield f"http://127.0.0.1:{server.server_port}", docs, hits
    finally:
        server.shutdown()


@pytest.fixture()
def fetch_env(monkeypatch, tmp_path):
    monkeypatch.setenv(CACHE_DIR_ENV, str(tmp_path / "fetch-cache"))
    monkeypatch.delenv(OFFLINE_ENV, raising=False)
    return monkeypatch


def test_fetch_caches_and_serves_offline(http_fixture, fetch_env):
    root, docs, hits = http_fixture
    docs["/doc.json"] = {"v": 1}
    url = f"{root}/doc.json"
    assert json.loads(fetch_text(url)) == {"v": 1}
    # Offline: served from disk cache, zero network.
    n = len(hits)
    assert json.loads(fetch_text(url, offline=True)) == {"v": 1}
    assert len(hits) == n
    # Env flag behaves like the explicit argument.
    fetch_env.setenv(OFFLINE_ENV, "1")
    assert json.loads(fetch_text(url)) == {"v": 1}
    assert len(hits) == n
    # Uncached URL offline → clear error, no hang.
    with pytest.raises(FetchError, match="no cached copy"):
        fetch_text(f"{root}/missing.json")


def test_fetch_falls_back_to_cache_on_failure(http_fixture, fetch_env):
    root, docs, hits = http_fixture
    docs["/doc.json"] = {"v": 2}
    url = f"{root}/doc.json"
    fetch_text(url)
    del docs["/doc.json"]  # server now 404s
    assert json.loads(fetch_text(url)) == {"v": 2}  # cache fallback
    with pytest.raises(FetchError, match="no cached copy exists"):
        fetch_text(f"{root}/never.json")


def test_remote_registry_lookup(http_fixture, fetch_env):
    from pyairbyte_spark import registry

    root, docs, _ = http_fixture
    docs["/registry.json"] = {
        "sources": [
            {
                "dockerRepository": "airbyte/source-pokeapi",
                "dockerImageTag": "2.0.0",
                "language": "manifest-only",
                "remoteRegistries": {"pypi": {"enabled": False}},
            }
        ],
        "destinations": [],
    }
    fetch_env.setenv("AIRBYTE_REGISTRY_URL", f"{root}/registry.json")
    fetch_env.delenv("AIRBYTE_LOCAL_REGISTRY", raising=False)
    registry._REGISTRY_CACHE = None  # drop memo
    try:
        meta = registry.get_connector_metadata("source-pokeapi")
        assert meta.latest_available_version == "2.0.0"
        assert meta.default_install_type == registry.InstallType.YAML
        # Builtins still present alongside the remote document.
        assert registry.get_connector_metadata("source-faker")
    finally:
        registry._REGISTRY_CACHE = None


def test_manifest_from_url(http_fixture, fetch_env):
    from pyairbyte_spark.sources.declarative import DeclarativeSource

    root, docs, _ = http_fixture
    docs["/manifest.json"] = {
        "name": "remote-manifest",
        "streams": [
            {
                "name": "nums",
                "json_schema": {"properties": {"id": {"type": "integer"}}},
                "source": {"type": "range", "count": 3, "template": {"id": "{i}"}},
            }
        ],
    }
    src = DeclarativeSource(f"{root}/manifest.json")
    assert src.name == "remote-manifest"
    recs = list(src.get_records("nums"))
    assert [r["id"] for r in recs] == [1, 2, 3]
