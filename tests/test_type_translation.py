"""Type-compiler matrix (mirrors reference
tests/unit_tests/test_type_translation.py:9-77 behavior)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from pyairbyte_spark.types import json_schema_to_struct, to_airbyte_type, to_spark_type


@pytest.mark.parametrize(
    ("schema", "expected"),
    [
        ({"type": "string"}, T.StringType()),
        ({"type": ["null", "string"]}, T.StringType()),
        ({"type": "boolean"}, T.BooleanType()),
        ({"type": "integer"}, T.LongType()),
        ({"type": "number"}, T.DecimalType(38, 9)),
        ({"type": "number", "airbyte_type": "integer"}, T.LongType()),
        ({"type": "string", "format": "date"}, T.DateType()),
        ({"type": "string", "format": "date-time"}, T.TimestampType()),
        (
            {"type": "string", "format": "date-time", "airbyte_type": "timestamp_without_timezone"},
            T.TimestampNTZType(),
        ),
        (
            {"type": "string", "format": "date-time", "airbyte_type": "timestamp_with_timezone"},
            T.TimestampType(),
        ),
        # Spark has no TIME type: documented deviation → string
        ({"type": "string", "format": "time", "airbyte_type": "time_without_timezone"}, T.StringType()),
        ({"type": "object"}, T.StringType()),
        ({"type": "array"}, T.StringType()),
        ({"type": "array", "items": {"type": "number"}}, T.ArrayType(T.FloatType())),
        # failover cases (reference types.py:115-117,163)
        ({"type": ["null", "string", "object"]}, T.StringType()),
        ({}, T.StringType()),
        ({"type": "weird"}, T.StringType()),
    ],
)
def test_to_spark_type(schema, expected):
    assert to_spark_type(schema) == expected


def test_nullability_from_union():
    _, nullable = to_airbyte_type({"type": ["null", "integer"]})
    assert nullable
    _, nullable = to_airbyte_type({"type": "integer"})
    assert nullable  # bare type stays nullable (JSON records may omit)


def test_struct_compilation():
    st = json_schema_to_struct(
        {
            "properties": {
                "id": {"type": "integer"},
                "price": {"type": "number"},
                "emb": {"type": "array", "items": {"type": "number"}},
            }
        }
    )
    assert st.fieldNames() == ["id", "price", "emb"]
    assert st["price"].dataType == T.DecimalType(38, 9)
    assert st["emb"].dataType == T.ArrayType(T.FloatType())


def test_variant_objects_opt_in(spark, tmp_path):
    """Spark 4 VariantType opt-in: objects/arrays parse natively in the
    JSON reader and support codegen'd variant_get path access."""
    import json

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = json_schema_to_struct(
        {
            "properties": {
                "id": {"type": "integer"},
                "meta": {"type": "object"},
                "tags": {"type": "array"},
            }
        },
        variant_objects=True,
    )
    assert isinstance(schema["meta"].dataType, T.VariantType)
    assert isinstance(schema["tags"].dataType, T.VariantType)
    p = tmp_path / "x.jsonl"
    p.write_text(json.dumps({"id": 1, "meta": {"a": {"b": 7}}, "tags": ["x", "y"]}) + "\n")
    df = spark.read.schema(schema).json(str(tmp_path))
    row = df.select(
        F.expr("variant_get(meta, '$.a.b', 'int')").alias("ab"),
        F.expr("variant_get(tags, '$[1]', 'string')").alias("t1"),
    ).collect()[0]
    assert (row["ab"], row["t1"]) == (7, "y")
    # default stays JSON strings (oracle-comparable parity mode)
    default = json_schema_to_struct({"properties": {"meta": {"type": "object"}}})
    assert isinstance(default["meta"].dataType, T.StringType)
