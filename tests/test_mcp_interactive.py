"""Scripted-input walk of the interactive console: registry browse →
filter → select → sync history → workspace status (reference parity:
``airbyte/mcp/interactive/_registry_ui.py``, ``_sync_history_ui.py``,
``_workspace_sync_status_ui.py``)."""

from __future__ import annotations

import io

import pytest

from pyairbyte_spark.cloud import CloudWorkspace, FakeCloudTransport
from pyairbyte_spark.mcp_interactive import (
    InteractiveConsole,
    SupportLevel,
    format_bytes,
    format_records,
    summarize_connections,
)

REGISTRY_DOC = {
    "sources": [
        {
            "dockerRepository": "airbyte/source-postgres",
            "dockerImageTag": "3.3.1",
            "language": "java",
            "supportLevel": "certified",
        },
        {
            "dockerRepository": "airbyte/source-pokeapi",
            "dockerImageTag": "0.2.0",
            "language": "manifest-only",
            "supportLevel": "community",
        },
        {
            "dockerRepository": "airbyte/source-dead",
            "dockerImageTag": "0.0.1",
            "language": "python",
            "supportLevel": "archived",
        },
    ],
    "destinations": [
        {
            "dockerRepository": "airbyte/destination-postgres",
            "dockerImageTag": "2.0.0",
            "language": "java",
            "supportLevel": "certified",
        }
    ],
}


@pytest.fixture()
def workspace():
    t = FakeCloudTransport()
    t.connections["conn-1"] = {
        "connectionId": "conn-1",
        "name": "pg to warehouse",
        "sourceId": "s1",
        "destinationId": "d1",
    }
    t.connections["conn-2"] = {
        "connectionId": "conn-2",
        "name": "broken feed",
        "sourceId": "s2",
        "destinationId": "d1",
    }
    t.jobs[1] = {
        "jobId": 1,
        "connectionId": "conn-1",
        "status": "succeeded",
        "rowsSynced": 1_500_000,
        "bytesSynced": 3 * 1024**3,
    }
    t.jobs[2] = {
        "jobId": 2,
        "connectionId": "conn-1",
        "status": "succeeded",
        "rowsSynced": 2_000,
        "bytesSynced": 64 * 1024,
    }
    t.jobs[3] = {
        "jobId": 3,
        "connectionId": "conn-2",
        "status": "failed",
        "rowsSynced": 0,
        "bytesSynced": 0,
    }
    return CloudWorkspace(workspace_id="ws-1", transport=t)


@pytest.fixture(autouse=True)
def seeded_registry():
    from pyairbyte_spark import registry

    registry.register_connectors(REGISTRY_DOC)
    yield
    registry._REGISTRY_CACHE = None  # don't leak into other tests


def _run(workspace, script: str) -> str:
    out = io.StringIO()
    InteractiveConsole(
        workspace=workspace, in_stream=io.StringIO(script), out_stream=out
    ).run()
    return out.getvalue()


def test_browse_filter_select_history_status_walkthrough(workspace):
    out = _run(
        workspace,
        "\n".join(
            [
                "connectors postgres",  # keyword filter
                "type source",  # narrow to sources
                "select source-postgres",  # detail card
                "history conn-1",  # sync history
                "status",  # workspace dashboard
                "quit",
            ]
        )
        + "\n",
    )
    # keyword filter matched both postgres connectors
    assert "source-postgres" in out and "destination-postgres" in out
    # type filter dropped the destination
    type_section = out.split("type=source", 1)[0]
    assert "2 connectors" in out  # postgres keyword, both types
    assert "1 connectors, page 1/1 [keyword=postgres, type=source]" in out
    # detail card
    assert "── source-postgres ──" in out
    assert "support level: certified" in out
    assert "version:       3.3.1" in out
    # history humanizes records and bytes
    assert "1.5M" in out and "3.0 GB" in out and "64.0 KB" in out
    assert "2 jobs, 2 succeeded" in out
    # dashboard flags the failing connection
    assert "2 connections, 1 with problems (conn-2)" in out
    assert "100%" in out  # conn-1 success rate
    assert "bye" in out
    del type_section


def test_support_level_filter_and_paging(workspace):
    out = _run(
        workspace,
        "connectors *\nsupport certified\npage 1\nquit\n",
    )
    # only the two certified connectors survive the support filter
    tail = out.split("support>=certified", 1)[0]
    assert "2 connectors, page 1/1 [support>=certified]" in out
    assert "source-dead" in out.split("support>=certified")[0]  # pre-filter listing
    post = out.split("support>=certified", 1)[1] if "support>=certified" in out else ""
    assert "source-dead" not in post
    del tail


def test_unknown_command_and_errors_do_not_crash(workspace):
    out = _run(workspace, "frobnicate\nselect no-such-connector\nhistory\nquit\n")
    assert "unknown command: frobnicate" in out
    assert "error:" in out  # unknown connector surfaced as error, loop alive
    assert "usage: history" in out
    assert "bye" in out


def test_console_without_workspace_is_registry_only():
    out = _run(None, "status\nquit\n")
    assert "no workspace attached" in out


def test_support_level_parse_precedence():
    assert SupportLevel.parse("certified").precedence > SupportLevel.parse(
        "community"
    ).precedence
    assert SupportLevel.parse("200") is SupportLevel.COMMUNITY
    with pytest.raises(ValueError, match="unrecognized support level"):
        SupportLevel.parse("gold")


def test_formatters():
    assert format_bytes(512) == "512 B"
    assert format_bytes(1536) == "1.5 KB"
    assert format_bytes(3 * 1024**3) == "3.0 GB"
    assert format_records(950) == "950"
    assert format_records(1_500) == "1.5K"
    assert format_records(2_500_000) == "2.5M"
    assert format_records(3_100_000_000) == "3.1B"


def test_summarize_connections_model(workspace):
    statuses = {s.connection_id: s for s in summarize_connections(workspace)}
    assert statuses["conn-1"].success_rate == 1.0
    assert not statuses["conn-1"].is_problem
    assert statuses["conn-2"].is_problem
    assert statuses["conn-1"].rows_synced == 1_502_000
