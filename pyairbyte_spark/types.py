"""JSON-Schema → Spark type compiler.

Reproduces the reference's conversion map and resolution algorithm
(``airbyte/types.py:15-96,124-163``) with Spark types:

- explicit ``airbyte_type`` wins over ``type``+``format``;
- nullable unions ``["null", X]`` pick the non-null member and mark the
  field nullable;
- ``object``/``array`` land as JSON strings (matching the reference's
  JSON-typed columns) unless a full sub-schema is present;
- anything unresolvable fails over to StringType (``types.py:115-117``).

Deviation (documented): Spark has no TIME type, so
``time_with/without_timezone`` land as StringType.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T


class SQLTypeConversionError(Exception):
    """Raised internally when a schema node cannot be resolved."""


# airbyte_type / resolved logical type → Spark type factory.
_AIRBYTE_TYPE_MAP: dict[str, T.DataType] = {
    "string": T.StringType(),
    "integer": T.LongType(),
    "number": T.DecimalType(38, 9),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "timestamp_with_timezone": T.TimestampType(),
    "timestamp_without_timezone": T.TimestampNTZType(),
    "time_with_timezone": T.StringType(),  # Spark has no TIME type
    "time_without_timezone": T.StringType(),
    "object": T.StringType(),  # JSON string column
    "array": T.StringType(),  # JSON string column
    "vector_array": T.ArrayType(T.FloatType()),  # embedding columns
}


def _dereference_type(json_schema: dict[str, Any]) -> tuple[str | list[str] | None, bool]:
    """Return (type, nullable) after unwrapping ["null", X] unions."""
    nullable = True
    node_type = json_schema.get("type")
    if isinstance(node_type, list):
        non_null = [t for t in node_type if t != "null"]
        nullable = "null" in node_type or not non_null
        if len(non_null) == 1:
            return non_null[0], nullable
        return non_null or None, nullable
    return node_type, nullable


def to_airbyte_type(json_schema: dict[str, Any]) -> tuple[str, bool]:
    """Resolve a JSON-Schema property node to an airbyte logical type name.

    Mirrors ``_get_airbyte_type`` (reference ``airbyte/types.py:37-96``):
    explicit ``airbyte_type`` wins, then type+format, then failover.
    """
    if not isinstance(json_schema, dict):
        raise SQLTypeConversionError(f"Invalid schema node: {json_schema!r}")

    airbyte_type = json_schema.get("airbyte_type")
    _, nullable = _dereference_type(json_schema)
    if airbyte_type and isinstance(airbyte_type, str):
        return airbyte_type, nullable

    node_type, nullable = _dereference_type(json_schema)
    if node_type is None or isinstance(node_type, list):
        # Mixed-type unions and missing types fail over to string
        # (reference types.py:115-117 and test_type_translation.py:57-61).
        raise SQLTypeConversionError(f"Unresolvable type in {json_schema!r}")

    fmt = json_schema.get("format")
    if node_type == "string":
        if fmt == "date":
            return "date", nullable
        if fmt == "date-time":
            return "timestamp_with_timezone", nullable
        if fmt == "time":
            return "time_without_timezone", nullable
        return "string", nullable
    if node_type in ("integer", "number", "boolean", "object"):
        return node_type, nullable
    if node_type == "array":
        items = json_schema.get("items")
        if isinstance(items, dict) and items.get("type") == "number":
            return "vector_array", nullable
        return "array", nullable
    raise SQLTypeConversionError(f"Unknown type {node_type!r}")


def to_spark_type(
    json_schema: dict[str, Any], *, variant_objects: bool = False
) -> T.DataType:
    """JSON-Schema property node → Spark DataType with string failover.

    ``variant_objects=True`` maps object/array to Spark 4's
    ``VariantType`` instead of JSON strings: the JSON reader parses
    them natively, they stay binary-encoded columnar (no re-parse per
    query), and ``variant_get`` path access is codegen'd. The default
    stays JSON strings for parity with the reference's JSON-typed
    columns (and DuckDB-comparable output).
    """
    try:
        airbyte_type, _ = to_airbyte_type(json_schema)
    except SQLTypeConversionError:
        return T.StringType()
    if variant_objects and airbyte_type in ("object", "array"):
        return T.VariantType()
    return _AIRBYTE_TYPE_MAP.get(airbyte_type, T.StringType())


def json_schema_to_struct(
    json_schema: dict[str, Any],
    *,
    normalizer=None,
    variant_objects: bool = False,
) -> T.StructType:
    """Compile a stream's JSON Schema into a StructType.

    ``normalizer`` (optional) is applied to top-level property names —
    by default the engine normalizes at write time instead.
    ``variant_objects`` — see :func:`to_spark_type`.
    """
    props = json_schema.get("properties", {})
    fields = []
    for name, node in props.items():
        col = normalizer.normalize(name) if normalizer else name
        try:
            _, nullable = to_airbyte_type(node) if isinstance(node, dict) else ("string", True)
        except SQLTypeConversionError:
            nullable = True
        fields.append(
            T.StructField(
                col,
                to_spark_type(
                    node if isinstance(node, dict) else {},
                    variant_objects=variant_objects,
                ),
                nullable,
            )
        )
    return T.StructType(fields)


def spark_type_to_sql_name(dtype: T.DataType) -> str:
    """Human-readable SQL name (for catalog metadata / display)."""
    return dtype.simpleString()
