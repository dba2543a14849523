"""Declarative manifest source tests (reference low-code path S3)."""

from __future__ import annotations

import json

import pytest

from pyairbyte_spark.sources.declarative import DeclarativeSource, load_manifest

MANIFEST = {
    "name": "decl-test",
    "streams": [
        {
            "name": "inline_items",
            "json_schema": {
                "properties": {"id": {"type": "integer"}, "v": {"type": "string"}}
            },
            "primary_key": ["id"],
            "cursor_field": "id",
            "source": {
                "type": "inline",
                "records": [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}],
            },
        },
        {
            "name": "generated",
            "json_schema": {
                "properties": {"id": {"type": "integer"}, "label": {"type": "string"}}
            },
            "source": {
                "type": "range",
                "count": 25,
                "template": {"id": "{i}", "label": "row-{i}"},
            },
        },
    ],
}


def test_manifest_catalog():
    src = DeclarativeSource(MANIFEST)
    catalog = src.discovered_catalog()
    assert set(catalog) == {"inline_items", "generated"}
    assert catalog["inline_items"].sync_mode == "incremental"


def test_inline_and_range_streams_sync(cache):
    src = DeclarativeSource(MANIFEST)
    res = src.read(cache, write_strategy="auto")
    assert res.record_counts == {"inline_items": 2, "generated": 25}
    labels = {r["id"]: r["label"] for r in cache.get_records("generated")}
    assert labels[7] == "row-7"


def test_incremental_second_sync_zero(cache):
    DeclarativeSource(MANIFEST).read(cache, write_strategy="auto")
    res2 = DeclarativeSource(MANIFEST).read(cache, write_strategy="auto")
    assert res2.record_counts["inline_items"] == 0


def test_jsonl_stream_source(cache, tmp_path):
    data = tmp_path / "rows.jsonl"
    data.write_text("\n".join(json.dumps({"id": i, "x": i * 2}) for i in range(5)))
    manifest = {
        "streams": [
            {
                "name": "filerows",
                "json_schema": {
                    "properties": {"id": {"type": "integer"}, "x": {"type": "integer"}}
                },
                "source": {"type": "jsonl", "path": str(data)},
            }
        ]
    }
    res = DeclarativeSource(manifest).read(cache, write_strategy="replace")
    assert res.record_counts["filerows"] == 5


def test_load_manifest_json_file(tmp_path):
    p = tmp_path / "m.json"
    p.write_text(json.dumps(MANIFEST))
    assert load_manifest(str(p))["name"] == "decl-test"


def test_record_selector_and_transformations(spark, tmp_path):
    """CDK-style shaping: select nested records, add/remove fields."""
    from pyairbyte_spark import SparkCache
    from pyairbyte_spark.sources.declarative import DeclarativeSource

    manifest = {
        "name": "shaped",
        "streams": [
            {
                "name": "items",
                "json_schema": {
                    "properties": {
                        "id": {"type": "integer"},
                        "label": {"type": "string"},
                    }
                },
                "source": {
                    "type": "inline",
                    "records": [
                        {"data": [{"id": 1, "raw": "a"}, {"id": 2, "raw": "b"}]},
                        {"data": [{"id": 3, "raw": "c"}]},
                    ],
                },
                "record_selector": {"field_path": ["data"]},
                "transformations": [
                    {"type": "add_fields", "fields": {"label": "item-{id}"}},
                    {"type": "remove_fields", "field_names": ["raw"]},
                ],
            }
        ],
    }
    cache = SparkCache(spark, str(tmp_path))
    src = DeclarativeSource(manifest)
    src.read(cache, write_strategy="append")
    rows = {r["id"]: r["label"] for r in cache.get_records("items")}
    assert rows == {1: "item-1", 2: "item-2", 3: "item-3"}


def test_parquet_source_kind(spark, tmp_path):
    from pyairbyte_spark import SparkCache
    from pyairbyte_spark.sources.declarative import DeclarativeSource

    manifest = {
        "name": "pq",
        "streams": [
            {
                "name": "regions",
                "json_schema": {
                    "properties": {
                        "r_regionkey": {"type": "integer"},
                        "r_name": {"type": "string"},
                    }
                },
                "source": {
                    "type": "parquet",
                    "path": "/root/testdata/sf0.001/region.parquet",
                },
            }
        ],
    }
    cache = SparkCache(spark, str(tmp_path))
    DeclarativeSource(manifest).read(cache, write_strategy="append")
    assert len(cache["regions"]) == 5


# -- HTTP requester (CDK low-code core) ---------------------------------------


@pytest.fixture()
def api_server():
    """Paginated JSON API fixture: offset + page + cursor pagination,
    bearer auth, per-partition routes, and a flaky endpoint."""
    import http.server
    import json as _json
    import threading
    import urllib.parse

    USERS = [{"id": i, "name": f"user-{i}", "updated_at": f"2024-01-{i % 28 + 1:02d}"}
             for i in range(45)]
    state = {"flaky_hits": 0, "auth_seen": [], "requests": []}

    class Handler(http.server.BaseHTTPRequestHandler):
        def _send(self, doc, code=200):
            body = _json.dumps(doc).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            qs = {k: v[0] for k, v in urllib.parse.parse_qs(parsed.query).items()}
            state["requests"].append(parsed.path)
            state["auth_seen"].append(self.headers.get("Authorization"))
            if parsed.path == "/users":
                if self.headers.get("Authorization") != "Bearer sk-test-token":
                    return self._send({"error": "unauthorized"}, 401)
                off, lim = int(qs.get("offset", 0)), int(qs.get("limit", 100))
                return self._send({"data": USERS[off : off + lim]})
            if parsed.path == "/pages":
                page, size = int(qs.get("p", 1)), int(qs.get("sz", 100))
                start = (page - 1) * size
                return self._send({"data": USERS[start : start + size]})
            if parsed.path == "/feed":
                cur = int(qs.get("next", 0))
                chunk = USERS[cur : cur + 20]
                nxt = cur + 20 if cur + 20 < len(USERS) else None
                return self._send(
                    {"items": chunk, "meta": ({"next": nxt} if nxt else {})}
                )
            if parsed.path.startswith("/region/"):
                region = parsed.path.rsplit("/", 1)[1]
                return self._send({"data": [{"id": 1, "city": f"{region}-city"}]})
            if parsed.path == "/flaky":
                state["flaky_hits"] += 1
                if state["flaky_hits"] <= 2:
                    return self._send({"error": "boom"}, 503)
                return self._send({"data": [{"id": 99}]})
            return self._send({"error": "not found"}, 404)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", state
    srv.shutdown()
    srv.server_close()


def test_http_offset_pagination_with_bearer_auth(cache, api_server, monkeypatch):
    base, state = api_server
    monkeypatch.setenv("API_TOKEN", "sk-test-token")
    manifest = {
        "name": "http-src",
        "streams": [
            {
                "name": "users",
                "json_schema": {
                    "properties": {
                        "id": {"type": "integer"},
                        "name": {"type": "string"},
                        "updated_at": {"type": "string"},
                    }
                },
                "cursor_field": "updated_at",
                "record_selector": {"field_path": ["data"]},
                "source": {
                    "type": "http",
                    "url_base": base,
                    "path": "/users",
                    "authenticator": {"type": "bearer", "token_env": "API_TOKEN"},
                    "paginator": {
                        "type": "offset_increment",
                        "offset_param": "offset",
                        "limit_param": "limit",
                        "page_size": 20,
                    },
                },
            }
        ],
    }
    src = DeclarativeSource(manifest)
    result = src.read(cache, write_strategy="append")
    assert result.record_counts == {"users": 45}
    assert sorted(r["id"] for r in cache.get_records("users")) == list(range(45))
    # 3 pages: 20 + 20 + 5 (short page stops the loop)
    assert state["requests"].count("/users") == 3
    assert all(a == "Bearer sk-test-token" for a in state["auth_seen"])


def test_http_page_increment_and_cursor_pagination(cache, api_server):
    base, state = api_server
    manifest = {
        "name": "http-src",
        "streams": [
            {
                "name": "paged",
                "json_schema": {"properties": {"id": {"type": "integer"}}},
                "record_selector": {"field_path": ["data"]},
                "source": {
                    "type": "http",
                    "url": f"{base}/pages",
                    "paginator": {
                        "type": "page_increment",
                        "page_param": "p",
                        "page_size_param": "sz",
                        "page_size": 15,
                        "start_page": 1,
                    },
                },
            },
            {
                "name": "feed",
                "json_schema": {"properties": {"id": {"type": "integer"}}},
                "record_selector": {"field_path": ["items"]},
                "source": {
                    "type": "http",
                    "url": f"{base}/feed",
                    "paginator": {
                        "type": "cursor",
                        "cursor_param": "next",
                        "cursor_path": ["meta", "next"],
                    },
                },
            },
        ],
    }
    result = DeclarativeSource(manifest).read(cache, write_strategy="append")
    assert result.record_counts == {"paged": 45, "feed": 45}
    # 15+15+15 full pages, then one empty page 4 ends the loop
    assert state["requests"].count("/pages") == 4
    assert state["requests"].count("/feed") == 3  # 20+20+5 via next tokens


def test_http_partition_router_and_retry(cache, api_server):
    base, state = api_server
    manifest = {
        "name": "http-src",
        "streams": [
            {
                "name": "cities",
                "json_schema": {
                    "properties": {
                        "id": {"type": "integer"},
                        "city": {"type": "string"},
                        "region": {"type": "string"},
                    }
                },
                "record_selector": {"field_path": ["data"]},
                "source": {
                    "type": "http",
                    "url": f"{base}/region/{{partition}}",
                    "partition_router": {
                        "type": "list",
                        "values": ["emea", "apac", "amer"],
                        "inject_into_record": "region",
                    },
                },
            },
            {
                "name": "flaky",
                "json_schema": {"properties": {"id": {"type": "integer"}}},
                "record_selector": {"field_path": ["data"]},
                "source": {"type": "http", "url": f"{base}/flaky", "max_retries": 3},
            },
        ],
    }
    result = DeclarativeSource(manifest).read(cache, write_strategy="append")
    assert result.record_counts == {"cities": 3, "flaky": 1}
    regions = sorted(r["region"] for r in cache.get_records("cities"))
    assert regions == ["amer", "apac", "emea"]
    cities = {r["region"]: r["city"] for r in cache.get_records("cities")}
    assert cities["emea"] == "emea-city"
    assert state["flaky_hits"] == 3  # two 503s retried, third succeeded


def test_schema_inference_when_json_schema_omitted(cache):
    manifest = {
        "name": "inferred",
        "streams": [
            {
                "name": "things",
                # no json_schema: types are inferred from sampled records
                "source": {
                    "type": "inline",
                    "records": [
                        {"id": 1, "price": 9.5, "tag": "a", "flag": True, "mixed": 1},
                        {"id": 2, "price": 3, "tag": None, "flag": False, "mixed": "x"},
                    ],
                },
            }
        ],
    }
    src = DeclarativeSource(manifest)
    spec = src.discovered_catalog()["things"]
    props = spec.json_schema["properties"]
    assert props["id"]["type"] == "integer"
    assert props["price"]["type"] == "number"  # int+float widens to number
    assert props["tag"]["type"] == "string"
    assert props["flag"]["type"] == "boolean"
    assert props["mixed"]["type"] == "string"  # conflict fails over

    result = src.read(cache, write_strategy="append")
    assert result.record_counts == {"things": 2}
    rows = {r["id"]: r for r in cache.get_records("things")}
    assert rows[1]["price"] == 9.5 and rows[2]["price"] == 3.0
    assert rows[1]["flag"] is True
