"""Declarative manifest source tests (reference low-code path S3)."""

from __future__ import annotations

import json

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
