"""Destination smoke-test suite (reference ``pyab destination-smoke-test``,
cli/pyab.py:632-720 + cli/smoke_test_source/): edge-case scenarios
through the full write path, with value-fidelity spot checks the row
counts alone can't prove."""

from __future__ import annotations

import json

import pytest

from pyairbyte_spark.sources.smoke import (
    LARGE_BATCH_DEFAULT,
    SmokeTestSource,
    run_destination_smoke_tests,
    select_scenarios,
)


@pytest.fixture()
def smoke_cache(spark, tmp_path):
    from pyairbyte_spark.cache import SparkCache

    return SparkCache(spark, str(tmp_path / "wh"))


def test_fast_suite_all_green(smoke_cache):
    results = run_destination_smoke_tests(smoke_cache, scenarios="fast")
    failed = [(r.name, r.error) for r in results if not r.ok]
    assert not failed, failed
    assert len(results) == len(select_scenarios("fast"))


def test_value_fidelity_spot_checks(smoke_cache):
    run_destination_smoke_tests(
        smoke_cache,
        scenarios="big_and_small_numbers,unicode_and_special_strings,"
        "duplicate_primary_keys,column_naming_edge_cases",
    )
    big = {r["id"]: r["big_int"] for r in smoke_cache.get_records("big_and_small_numbers")}
    assert big[1] == 9_007_199_254_740_993  # exact int64, no float corruption
    uni = {r["id"]: r["s"] for r in smoke_cache.get_records("unicode_and_special_strings")}
    assert "\U0001f680" in uni[1] and "機械学習" in uni[1]
    assert uni[4] == "line\nbreak\ttab\\backslash"
    dup = {r["id"]: r["v"] for r in smoke_cache.get_records("duplicate_primary_keys")}
    assert dup == {1: "third", 2: "first", 3: "first"}  # merge keeps latest
    cols = set(smoke_cache.get_dataset("column_naming_edge_cases").column_names)
    assert {"with_space", "with_hyphen"} <= cols  # normalized, not dropped


def test_large_batch_crosses_rotation_boundary(smoke_cache):
    results = run_destination_smoke_tests(smoke_cache, scenarios="large_batch_stream")
    assert results[0].ok, results[0]
    assert results[0].actual_rows == LARGE_BATCH_DEFAULT


def test_unknown_scenario_name_rejected():
    with pytest.raises(ValueError, match="unknown smoke scenarios"):
        select_scenarios("not_a_scenario")


def test_smoke_source_is_regular_source(smoke_cache):
    src = SmokeTestSource(select_scenarios("basic_types,empty_stream"))
    assert src.check()
    assert sorted(src.get_available_streams()) == ["basic_types", "empty_stream"]
    res = src.read(smoke_cache, write_strategy="auto")
    assert res.record_counts.get("basic_types") == 3


def test_cli_destination_smoke_test(capsys):
    from pyairbyte_spark.cli import main

    rc = main(["destination-smoke-test", "--scenarios", "basic_types,null_handling"])
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert rc == 0 and summary == {"passed": 2, "failed": 0}


def test_smoke_through_destination_connector(smoke_cache, tmp_path):
    """The connector-destination path: scenarios replay through a real
    subprocess destination (fake connector script) and the write is
    confirmed via its STATE echoes."""
    import sys

    from pyairbyte_spark.destinations import SparkDestination
    from pyairbyte_spark.sources.subprocess_host import SubprocessHost
    from tests.test_connector_roundtrip import CONNECTOR_SCRIPT

    script = tmp_path / "fake_connector.py"
    script.write_text(CONNECTOR_SCRIPT)
    dest = SparkDestination(
        SubprocessHost([sys.executable, str(script)]), name="smoke-dest"
    )
    results = run_destination_smoke_tests(
        smoke_cache, scenarios="basic_types,duplicate_primary_keys", destination=dest
    )
    assert all(r.ok for r in results), [(r.name, r.error) for r in results]
    arts = smoke_cache.get_destination_state_provider("smoke-dest").state_artifacts
    assert arts  # destination confirmed the write
