"""CI smoke for the maintenance-story example: the index-follower
tour runs end to end — attach → DML → one-tick sync → replay no-op →
probes → doctor review (dry run) → MCP-tool/library parity →
apply-heal. The tour asserts the MCP ``apply_store_maintenance``
action list equals the library ``apply_maintenance_plan`` list
in-script; this test just drives the whole script in-process (reusing
the test Spark session via ``get_spark``'s getOrCreate)."""

from __future__ import annotations

import pytest
import os
import runpy


@pytest.mark.slow
def test_index_follower_tour_runs(spark, capsys):
    path = os.path.join(
        os.path.dirname(__file__), "..", "examples",
        "index_follower_tour.py",
    )
    runpy.run_path(path, run_name="__main__")
    out = capsys.readouterr().out
    assert "MCP tool action list == library action list: True" in out
    assert "applied:" in out
