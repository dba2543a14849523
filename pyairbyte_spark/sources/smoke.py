"""Destination smoke-test source: edge-case scenarios for write paths.

Parity surface: the reference ships a dedicated smoke-test source and a
``destination-smoke-test`` CLI command (reference
``cli/smoke_test_source/_scenarios.py:1-762``, ``cli/pyab.py:632-720``)
that pump adversarial schemas/records through a destination connector.
The scenario *categories* below mirror that suite — basic/timestamp/
numeric types, nested objects, null handling, naming edge cases, wide
and empty tables, unicode, duplicate primary keys, union types, sparse
records, large batches — with independently authored schemas and data.

Every scenario is deterministic, so repeat runs are comparable and the
duplicate-PK scenario doubles as a merge-semantics check (AUTO resolves
to MERGE when a primary key exists: 3 distinct keys in, 3 rows out).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field
from typing import Any

from pyairbyte_spark.catalog import StreamSpec
from pyairbyte_spark.sources.base import SparkSource
from pyairbyte_spark.sources.messages import (
    AirbyteMessage,
    RecordMessage,
    StateMessage,
    TraceMessage,
)
from pyairbyte_spark.state import StateProvider

_STR = {"type": "string"}
_INT = {"type": "integer"}
_NUM = {"type": "number"}
_BOOL = {"type": "boolean"}
_TS = {"type": "string", "format": "date-time"}

LARGE_BATCH_DEFAULT = 120_000  # crosses the 100k batch-rotation boundary


@dataclass
class Scenario:
    name: str
    json_schema: dict[str, Any]
    records: list[dict[str, Any]] = field(default_factory=list)
    primary_keys: list[str] = field(default_factory=list)
    expected_rows: int | None = None  # None -> len(records)
    generator: Any = None  # () -> Iterator[dict]; overrides records

    def spec(self) -> StreamSpec:
        return StreamSpec(
            name=self.name,
            json_schema=self.json_schema,
            primary_keys=self.primary_keys,
        )

    def rows(self) -> Iterator[dict[str, Any]]:
        if self.generator is not None:
            yield from self.generator()
        else:
            yield from self.records

    @property
    def expected(self) -> int:
        if self.expected_rows is not None:
            return self.expected_rows
        return len(self.records)


def _props(cols: dict[str, dict]) -> dict[str, Any]:
    return {"properties": cols}


def _large_batch_rows() -> Iterator[dict[str, Any]]:
    for i in range(LARGE_BATCH_DEFAULT):
        yield {"id": i, "payload": f"row-{i:07d}", "bucket": i % 97}


SCENARIOS: list[Scenario] = [
    Scenario(
        "basic_types",
        _props({"id": _INT, "label": _STR, "score": _NUM, "active": _BOOL}),
        [
            {"id": 1, "label": "first", "score": 1.5, "active": True},
            {"id": 2, "label": "", "score": -2.25, "active": False},
            {"id": 3, "label": "third", "score": 0.0, "active": True},
        ],
        primary_keys=["id"],
    ),
    Scenario(
        "timestamp_types",
        _props(
            {
                "id": _INT,
                "at_utc": _TS,
                "at_offset": _TS,
                "just_date": {"type": "string", "format": "date"},
                "just_time": {"type": "string", "format": "time"},
            }
        ),
        [
            {
                "id": 1,
                "at_utc": "2024-06-01T12:00:00Z",
                "at_offset": "2024-06-01T14:30:00+02:30",
                "just_date": "2024-06-01",
                "just_time": "23:59:59",
            },
            {
                "id": 2,
                "at_utc": "1970-01-01T00:00:00Z",
                "at_offset": "2024-12-31T23:59:59-11:00",
                "just_date": "1899-12-31",
                "just_time": "00:00:00",
            },
        ],
        primary_keys=["id"],
    ),
    Scenario(
        "big_and_small_numbers",
        _props({"id": _INT, "big_int": _INT, "tiny": _NUM, "huge": _NUM, "neg": _NUM}),
        [
            {
                "id": 1,
                "big_int": 9_007_199_254_740_993,  # > 2^53: float would corrupt
                "tiny": 5e-308,
                "huge": 1.7e308,
                "neg": -0.0,
            },
            {"id": 2, "big_int": -(2**62), "tiny": 1e-9, "huge": 123456789.123456, "neg": -1e-300},
        ],
        primary_keys=["id"],
    ),
    Scenario(
        "nested_objects",
        _props(
            {
                "id": _INT,
                "obj": {"type": "object"},
                "deep": {"type": "object"},
            }
        ),
        [
            {
                "id": 1,
                "obj": {"a": 1, "b": "two"},
                "deep": {"lvl1": {"lvl2": {"lvl3": ["x", "y"], "n": 3}}},
            },
            {"id": 2, "obj": {}, "deep": {"lvl1": None}},
        ],
        primary_keys=["id"],
    ),
    Scenario(
        "null_handling",
        _props({"id": _INT, "maybe_str": _STR, "maybe_num": _NUM, "maybe_bool": _BOOL}),
        [
            {"id": 1, "maybe_str": None, "maybe_num": None, "maybe_bool": None},
            {"id": 2, "maybe_str": "present"},  # missing keys, not just nulls
            {"id": 3},
        ],
        primary_keys=["id"],
    ),
    Scenario(
        "column_naming_edge_cases",
        _props(
            {
                "id": _INT,
                "With Space": _STR,
                "with-hyphen": _STR,
                "dotted.name": _STR,
                "CamelCased": _STR,
                "select": _STR,  # reserved word
            }
        ),
        [
            {
                "id": 1,
                "With Space": "a",
                "with-hyphen": "b",
                "dotted.name": "c",
                "CamelCased": "d",
                "select": "e",
            }
        ],
        primary_keys=["id"],
    ),
    Scenario(
        "CamelCaseStreamName",
        _props({"id": _INT, "v": _STR}),
        [{"id": 1, "v": "x"}, {"id": 2, "v": "y"}],
        primary_keys=["id"],
    ),
    Scenario(
        "wide_table_50_columns",
        _props({"id": _INT, **{f"c{i:02d}": _STR for i in range(49)}}),
        [
            {"id": 1, **{f"c{i:02d}": f"v{i}" for i in range(49)}},
            {"id": 2, **{f"c{i:02d}": None for i in range(49)}},
        ],
        primary_keys=["id"],
    ),
    Scenario(
        "empty_stream",
        _props({"id": _INT, "v": _STR}),
        [],
        primary_keys=["id"],
    ),
    Scenario(
        "single_record_stream",
        _props({"id": _INT, "v": _STR}),
        [{"id": 42, "v": "only"}],
        primary_keys=["id"],
    ),
    Scenario(
        "unicode_and_special_strings",
        _props({"id": _INT, "s": _STR}),
        [
            {"id": 1, "s": "emoji \U0001f680\U0001f9ea and CJK 機械学習"},
            {"id": 2, "s": "rtl مرحبا mixed"},
            {"id": 3, "s": 'quotes "double" \'single\' `back`'},
            {"id": 4, "s": "line\nbreak\ttab\\backslash"},
            {"id": 5, "s": "null byte stand-in \\u0000 and bom ﻿"},
        ],
        primary_keys=["id"],
    ),
    Scenario(
        "schema_with_no_primary_key",
        _props({"v": _STR, "n": _INT}),
        [{"v": "a", "n": 1}, {"v": "a", "n": 1}, {"v": "b", "n": 2}],
        # no PK + no cursor -> AUTO resolves to REPLACE; all rows kept
    ),
    Scenario(
        "long_column_names",
        _props({"id": _INT, ("c" * 200): _STR}),
        [{"id": 1, ("c" * 200): "deep"}],
        primary_keys=["id"],
    ),
    Scenario(
        "duplicate_primary_keys",
        _props({"id": _INT, "v": _STR}),
        [
            {"id": 1, "v": "first"},
            {"id": 2, "v": "first"},
            {"id": 1, "v": "second"},
            {"id": 3, "v": "first"},
            {"id": 1, "v": "third"},
        ],
        primary_keys=["id"],
        expected_rows=3,  # merge keeps the latest per key
    ),
    Scenario(
        "union_types",
        _props({"id": _INT, "mixed": {"type": ["null", "string", "integer"]}}),
        [
            {"id": 1, "mixed": "text"},
            {"id": 2, "mixed": 7},
            {"id": 3, "mixed": None},
        ],
        primary_keys=["id"],
    ),
    Scenario(
        "array_of_primitives",
        _props(
            {
                "id": _INT,
                "tags": {"type": "array", "items": _STR},
                "nums": {"type": "array", "items": _NUM},
            }
        ),
        [
            {"id": 1, "tags": ["a", "b"], "nums": [1.5, 2.5]},
            {"id": 2, "tags": [], "nums": []},
        ],
        primary_keys=["id"],
    ),
    Scenario(
        "special_number_values",
        _props({"id": _INT, "x": _NUM, "as_str": _STR}),
        [
            # JSON has no NaN/Inf: they travel as strings (as_str),
            # while x probes exponent extremes that ARE representable.
            {"id": 1, "x": 1e-323, "as_str": "NaN"},
            {"id": 2, "x": -1e308, "as_str": "Infinity"},
            {"id": 3, "x": 0.1 + 0.2, "as_str": "-Infinity"},
        ],
        primary_keys=["id"],
    ),
    Scenario(
        "sparse_records",
        _props({"id": _INT, "a": _STR, "b": _STR, "c": _STR, "d": _STR}),
        [
            {"id": 1, "a": "x"},
            {"id": 2, "b": "y", "c": "z"},
            {"id": 3, "d": "w"},
        ],
        primary_keys=["id"],
    ),
    Scenario(
        "large_batch_stream",
        _props({"id": _INT, "payload": _STR, "bucket": _INT}),
        primary_keys=["id"],
        expected_rows=LARGE_BATCH_DEFAULT,
        generator=_large_batch_rows,
    ),
]

FAST_EXCLUDES = {"large_batch_stream"}


def select_scenarios(which: str = "fast") -> list[Scenario]:
    """``fast`` (all but the large batch), ``all``, or a comma list."""
    if which == "all":
        return list(SCENARIOS)
    if which == "fast":
        return [s for s in SCENARIOS if s.name not in FAST_EXCLUDES]
    wanted = {w.strip() for w in which.split(",") if w.strip()}
    known = {s.name for s in SCENARIOS}
    missing = wanted - known
    if missing:
        raise ValueError(f"unknown smoke scenarios: {sorted(missing)}")
    return [s for s in SCENARIOS if s.name in wanted]


class SmokeTestSource(SparkSource):
    """All selected scenarios as one multi-stream source."""

    name = "source-smoke-test"

    def __init__(self, scenarios: list[Scenario] | None = None) -> None:
        super().__init__()
        self.scenarios = scenarios if scenarios is not None else select_scenarios("fast")

    def discovered_catalog(self) -> dict[str, StreamSpec]:
        return {s.name: s.spec() for s in self.scenarios}

    def generate_messages(
        self, streams: list[str], state: StateProvider | None
    ) -> Iterator[AirbyteMessage]:
        by_name = {s.name: s for s in self.scenarios}
        for stream in streams:
            scenario = by_name.get(stream)
            if scenario is None:
                continue
            n = 0
            for rec in scenario.rows():
                n += 1
                yield AirbyteMessage(
                    "RECORD", record=RecordMessage(stream=stream, data=rec)
                )
            yield AirbyteMessage(
                "STATE", state=StateMessage(stream_name=stream, state={"rows": n})
            )
            yield AirbyteMessage(
                "TRACE",
                trace=TraceMessage(
                    trace_type="STREAM_STATUS", stream_name=stream, status="COMPLETE"
                ),
            )


@dataclass
class ScenarioResult:
    name: str
    ok: bool
    expected_rows: int
    actual_rows: int | None
    error: str | None = None


def run_destination_smoke_tests(
    cache,
    *,
    scenarios: str | list[Scenario] = "fast",
    destination=None,
) -> list[ScenarioResult]:
    """Pump every scenario through the write path and verify row counts.

    With ``destination`` (a :class:`SparkDestination`), messages go
    through the connector's stdin/stdout protocol loop first (the
    reference's smoke-test shape); the cache records what the
    destination confirmed. Without one, scenarios sync straight into
    ``cache`` and counts are read back from the warehouse — including
    the merge check on ``duplicate_primary_keys``.
    """
    chosen = scenarios if isinstance(scenarios, list) else select_scenarios(scenarios)
    results: list[ScenarioResult] = []
    for scenario in chosen:
        src = SmokeTestSource([scenario])
        try:
            src.read(cache, write_strategy="auto")
            if destination is not None:
                destination.write(
                    cache,
                    cache=cache,
                    streams=[scenario.name],
                    source_name=src.name,
                )
            actual = len(cache.get_dataset(scenario.name))
            ok = actual == scenario.expected
            results.append(
                ScenarioResult(scenario.name, ok, scenario.expected, actual)
            )
        except Exception as ex:  # noqa: BLE001 - per-scenario isolation
            results.append(
                ScenarioResult(scenario.name, False, scenario.expected, None, str(ex))
            )
    return results
