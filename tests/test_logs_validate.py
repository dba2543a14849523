"""Structured log surface + deep validate flow."""

from __future__ import annotations

import json
import logging

import pytest


@pytest.fixture()
def log_root(monkeypatch, tmp_path):
    root = tmp_path / "logs"
    monkeypatch.setenv("AIRBYTE_LOGGING_ROOT", str(root))
    monkeypatch.delenv("AIRBYTE_STRUCTURED_LOGGING", raising=False)
    # get_global_file_logger is lru_cached and loggers are process-global
    # singletons: clear both between tests.
    from pyairbyte_spark import logs

    logs.get_global_file_logger.cache_clear()
    logging.getLogger("pyairbyte_spark").handlers.clear()
    return root


def test_global_and_connector_file_logs(log_root):
    from pyairbyte_spark import logs

    g = logs.get_global_file_logger()
    assert g is not None
    g.info("engine event")
    conn = logs.new_passthrough_file_logger("source-demo")
    conn.info("connector line")
    path = logs.logger_file_path(conn)
    assert path is not None and path.parent == log_root / "source-demo"
    assert "connector line" in path.read_text()
    assert logs.get_global_log_paths()
    gtext = logs.get_global_log_paths()[0].read_text()
    assert "engine event" in gtext
    assert "source-demo" in gtext  # global log records the file routing


def test_structured_json_lines(log_root, monkeypatch):
    monkeypatch.setenv("AIRBYTE_STRUCTURED_LOGGING", "true")
    from pyairbyte_spark import logs

    conn = logs.new_passthrough_file_logger("source-json")
    conn.info("hello %s", "world")
    path = logs.logger_file_path(conn)
    line = json.loads(path.read_text().splitlines()[-1])
    assert line["event"] == "hello world"
    assert line["level"] == "info" and line["logger"].startswith("pyairbyte_spark")


def test_subprocess_stderr_lands_in_connector_log(log_root, tmp_path):
    import sys

    from pyairbyte_spark import logs
    from pyairbyte_spark.sources.subprocess_host import SubprocessHost

    script = tmp_path / "noisy.py"
    script.write_text(
        "import sys\n"
        "sys.stderr.write('warn: something odd\\n')\n"
        "sys.stdout.write('{\"type\": \"SPEC\", \"spec\": {}}\\n')\n"
    )
    host = SubprocessHost([sys.executable, str(script)], name="source-noisy")
    assert host.spec() == {}
    path = logs.logger_file_path(host._stderr_logger())
    assert path is not None
    assert "warn: something odd" in path.read_text()


def test_unwritable_root_degrades_gracefully(monkeypatch, tmp_path):
    blocker = tmp_path / "blocked"
    blocker.write_text("a file, not a dir")
    monkeypatch.setenv("AIRBYTE_LOGGING_ROOT", str(blocker / "sub"))
    from pyairbyte_spark import logs

    logs.get_global_file_logger.cache_clear()
    logging.getLogger("pyairbyte_spark").handlers.clear()
    with pytest.warns(UserWarning, match="logging directory"):
        assert logs.get_global_file_logger() is None
    conn = logs.new_passthrough_file_logger("source-x")
    assert logs.logger_file_path(conn) is None  # console-only, no crash
    logs.get_global_file_logger.cache_clear()


def test_deep_validate_full_flow():
    from pyairbyte_spark.sources import SourceFaker
    from pyairbyte_spark.validate import full_tests, install_only_test

    src = SourceFaker(seed=3, count=10)
    report = full_tests(src)
    assert report["check"] is True
    assert report["read_stream"] in report["streams"]
    assert install_only_test(src)["spec_returned"] is True


def test_deep_validate_raises_when_no_data():
    from pyairbyte_spark import exceptions as exc
    from pyairbyte_spark.sources.declarative import DeclarativeSource
    from pyairbyte_spark.validate import full_tests

    empty = DeclarativeSource(
        {
            "name": "empty",
            "streams": [
                {
                    "name": "void",
                    "json_schema": {"properties": {"id": {"type": "integer"}}},
                    "source": {"type": "inline", "records": []},
                }
            ],
        }
    )
    with pytest.raises(exc.AirbyteNoDataFromConnectorError):
        full_tests(empty)


def test_cli_deep_validate(capsys):
    from pyairbyte_spark.cli import main

    assert main(["validate", "faker", "--deep"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["check"] is True and out["read_stream"]


def test_deep_validate_stops_on_failed_check():
    """A failed connection check is the finding: full_tests must report
    it instead of probing streams and raising a misleading
    no-data-from-connector error."""
    from pyairbyte_spark.validate import full_tests

    class BadSource:
        def check(self):
            return False

        def get_available_streams(self):  # pragma: no cover - must not run
            raise AssertionError("streams probed after failed check")

    report = full_tests(BadSource())
    assert report["check"] is False and report["read_stream"] is None
