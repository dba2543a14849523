"""Subprocess connector host + destination round-trip tests.

Uses a real external process: a Python script speaking the Airbyte
JSONL protocol over stdio (the reference's fixture-connector shape,
``tests/integration_tests/fixtures/source-test``).
"""

from __future__ import annotations

import json
import sys
import textwrap

import pytest

from pyairbyte_spark.destinations import SparkDestination
from pyairbyte_spark.sources.connector import ConnectorSource
from pyairbyte_spark.sources.subprocess_host import ConnectorError, SubprocessHost

CONNECTOR_SCRIPT = textwrap.dedent(
    """
    import json, sys

    CATALOG = {"streams": [{
        "name": "items",
        "json_schema": {"properties": {"id": {"type": "integer"},
                                        "name": {"type": "string"}}},
        "supported_sync_modes": ["full_refresh", "incremental"],
        "source_defined_primary_key": [["id"]],
        "default_cursor_field": ["id"],
    }]}

    def out(obj):
        sys.stdout.write(json.dumps(obj) + "\\n")

    verb = sys.argv[1]
    if verb == "spec":
        out({"type": "SPEC", "spec": {"connectionSpecification": {}}})
    elif verb == "check":
        out({"type": "CONNECTION_STATUS",
             "connectionStatus": {"status": "SUCCEEDED"}})
    elif verb == "discover":
        out({"type": "CATALOG", "catalog": CATALOG})
    elif verb == "read":
        state_from = 0
        if "--state" in sys.argv:
            with open(sys.argv[sys.argv.index("--state") + 1]) as f:
                arts = json.load(f)
            for a in arts or []:
                st = a.get("stream", {}).get("stream_state", {})
                state_from = max(state_from, int(st.get("max_id", 0)))
        for i in range(state_from + 1, 6):
            out({"type": "RECORD", "record": {"stream": "items",
                 "data": {"id": i, "name": f"item-{i}"}, "emitted_at": 0}})
        out({"type": "STATE", "state": {"type": "STREAM", "stream": {
             "stream_descriptor": {"name": "items"},
             "stream_state": {"max_id": 5}}}})
        out({"type": "TRACE", "trace": {"type": "STREAM_STATUS",
             "stream_status": {"stream_descriptor": {"name": "items"},
                               "status": "COMPLETE"}}})
    elif verb == "write":
        cfg = {}
        if "--config" in sys.argv:
            with open(sys.argv[sys.argv.index("--config") + 1]) as f:
                cfg = json.load(f)
        n = 0
        for line in sys.stdin:
            if not line.strip():
                continue
            msg = json.loads(line)
            if msg.get("type") == "RECORD":
                n += 1
            elif msg.get("type") == "STATE":
                out(msg)  # confirm state back to caller
        out({"type": "STATE", "state": {"type": "STREAM", "stream": {
             "stream_descriptor": {"name": "items"},
             "stream_state": {"written": n, "cfg": cfg}}}})
    """
)


@pytest.fixture()
def connector(tmp_path):
    script = tmp_path / "fake_connector.py"
    script.write_text(CONNECTOR_SCRIPT)
    return SubprocessHost([sys.executable, str(script)])


def test_protocol_verbs(connector):
    assert connector.spec() == {"connectionSpecification": {}}
    assert connector.check({}) is True
    catalog = connector.discover({})
    assert catalog["streams"][0]["name"] == "items"


def test_connector_source_end_to_end(connector, cache):
    src = ConnectorSource(connector, name="fake-src")
    assert src.check()
    assert src.get_available_streams() == ["items"]
    res = src.read(cache, write_strategy="auto")
    assert res.record_counts["items"] == 5
    rows = {r["id"]: r["name"] for r in cache.get_records("items")}
    assert rows[3] == "item-3"
    # incremental second sync: connector honors the state file → 0 records
    res2 = ConnectorSource(connector, name="fake-src").read(cache, write_strategy="auto")
    assert res2.record_counts.get("items", 0) == 0


def test_destination_write_roundtrip(connector, cache):
    from pyairbyte_spark.results import WriteResult

    src = ConnectorSource(connector, name="fake-src")
    src.read(cache, write_strategy="auto")
    dest = SparkDestination(connector, name="fake-dest")
    result = dest.write(cache, cache=cache, streams=["items"])
    # write returns a WriteResult (reference results.py:103-150):
    # iterable over confirmations, with the delivered-record tally.
    assert isinstance(result, WriteResult)
    assert result.processed_records == 5
    written = [a.state.get("written") for a in result if "written" in a.state]
    assert written == [5]
    # destination state landed in the destination state channel
    dsp = cache.get_destination_state_provider("fake-dest")
    assert dsp.state_artifacts
    assert result.get_state_provider().state_artifacts


def test_source_api_parity_surface(connector, spark, monkeypatch, capsys):
    """Reference Source API: set_config/config_spec/docs_url/
    get_stream_json_schema/plural setters/print_samples/get_documents."""
    src = ConnectorSource(connector, name="source-fake")
    assert src.config_spec == {}  # fixture spec has empty connectionSpecification
    assert src.docs_url.endswith("/sources/fake")
    assert src.get_stream_json_schema("items")["properties"]["id"] == {
        "type": "integer"
    }
    src.set_cursor_keys(items="id")
    src.set_primary_keys(items="id")  # bare string → single-column key
    spec = src.configured_specs()["items"]
    assert spec.cursor_field == "id" and spec.primary_keys == ["id"]
    src.set_streams(["items"])
    assert src.get_selected_streams() == ["items"]

    monkeypatch.setenv("FAKE_KEY", "k-9")
    src.set_config({"api_key": "secret_reference::FAKE_KEY"}, validate=True)
    assert src.config == {"api_key": "k-9"}  # hydrated

    src.print_samples(limit=2)
    out = capsys.readouterr().out
    assert "## items" in out and "item-1" in out

    docs = src.get_documents("items", title_property="name")
    rows = {r["id"]: r["content"] for r in docs.collect()}
    assert any("# item-1" in c for c in rows.values())


def test_write_distributed_partition_parallel(tmp_path, spark, cache):
    """Partition-parallel reverse ETL: one connector process per
    partition, record envelopes built JVM-side, only STATE confirmations
    collected. Totals across partitions must cover every row exactly
    once, and per-partition state must land in the destination state
    channel."""
    script = tmp_path / "fake_connector.py"
    script.write_text(CONNECTOR_SCRIPT)
    dest = SparkDestination(
        SubprocessHost([sys.executable, str(script)]),
        name="dist-dest",
        config={"token": "t-1"},
    )
    df = spark.range(0, 1000).selectExpr("id", "concat('name-', id) AS name")
    artifacts = dest.write_distributed(
        df, stream_name="items", num_processes=4, state_store=cache
    )
    # The fake connector echoes our per-partition STATE then emits its own
    # summary STATE carrying {written: n, cfg: config}.
    echoed = [a for a in artifacts if "partition" in a.state]
    summaries = [a for a in artifacts if "written" in a.state]
    assert len(echoed) == 4 and len(summaries) == 4
    assert sum(a.state["rows"] for a in echoed) == 1000
    assert sum(a.state["written"] for a in summaries) == 1000
    # Hydrated config reached every partition's subprocess.
    assert all(a.state["cfg"] == {"token": "t-1"} for a in summaries)
    # Confirmations landed in the destination state channel.
    dsp = cache.get_destination_state_provider("dist-dest")
    assert len(dsp.state_artifacts) >= 4


def test_write_distributed_surfaces_partition_stderr(tmp_path, spark):
    """A failing partition connector must surface its stderr in the
    task error, not vanish into /dev/null."""
    bad = tmp_path / "bad_dest.py"
    bad.write_text("import sys; sys.stderr.write('auth denied xyz\\n'); sys.exit(7)")
    dest = SparkDestination(
        SubprocessHost([sys.executable, str(bad)]), name="bad-dist"
    )
    df = spark.range(0, 10).toDF("id")
    with pytest.raises(Exception, match="auth denied xyz"):
        dest.write_distributed(df, stream_name="s", num_processes=2)


def test_write_distributed_requires_executor(spark):
    dest = SparkDestination(sink=lambda lines: [], name="sink-only")
    df = spark.range(3).toDF("id")
    with pytest.raises(ValueError):
        dest.write_distributed(df, stream_name="s")


def test_destination_receives_hydrated_config(connector, cache):
    """The write subprocess must get the destination's actual config
    serialized to a file — not /dev/null (an external connector with an
    empty config fails auth immediately)."""
    src = ConnectorSource(connector, name="fake-src")
    src.read(cache, write_strategy="auto")
    dest = SparkDestination(
        connector, name="fake-dest", config={"api_key": "k-123", "host": "h"}
    )
    confirmations = dest.write(cache, cache=cache, streams=["items"])
    cfgs = [a.state["cfg"] for a in confirmations if "cfg" in a.state]
    assert cfgs == [{"api_key": "k-123", "host": "h"}]


def test_replay_emits_state_from_source_scope(connector, cache):
    """Path A (source→cache→replay) must replay the source's own STATE
    messages downstream — state lives under the source's scope, not a
    '__replay__' scope nothing writes."""
    src = ConnectorSource(connector, name="fake-src")
    dest = SparkDestination(connector, name="fake-dest")
    confirmations = dest.write(src, cache=cache)
    # The source checkpoints {"max_id": 5}; the destination echoes every
    # STATE it receives, so the confirmation list must contain it.
    echoed = [a.state for a in confirmations if a.state.get("max_id") == 5]
    assert echoed, [a.state for a in confirmations]


def test_in_process_sink():
    lines_seen = []

    def sink(lines):
        lines_seen.extend(lines)
        yield json.dumps(
            {"type": "STATE", "state": {"type": "STREAM", "stream": {
                "stream_descriptor": {"name": "s"}, "stream_state": {"ok": 1}}}}
        )

    from pyairbyte_spark.sources.messages import AirbyteMessage, RecordMessage

    dest = SparkDestination(sink=sink, name="cb")
    out, n_records = dest._write_message_stream(
        [AirbyteMessage("RECORD", record=RecordMessage("s", {"a": 1}))], None
    )
    assert len(lines_seen) == 1 and out[0].state == {"ok": 1}
    assert n_records == 1


def test_connector_error_surfaces_stderr(tmp_path):
    bad = tmp_path / "bad.py"
    bad.write_text("import sys; sys.stderr.write('boom\\n'); sys.exit(3)")
    host = SubprocessHost([sys.executable, str(bad)])
    with pytest.raises(ConnectorError, match="boom"):
        list(host.execute(["read"]))


def test_streaming_reverse_etl(spark, connector, tmp_path, cache):
    """Micro-batches pump into the destination connector; STATE
    confirmations land in the destination state store (latest wins per
    stream), and a re-run with the same checkpoint delivers nothing."""
    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    spark.range(10).selectExpr("id", "concat('n-', id) AS name").coalesce(
        2
    ).write.parquet(str(src_dir / "p"))
    schema = spark.read.parquet(str(src_dir / "p")).schema

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir / "p"))
        )
        dest = SparkDestination(connector, name="stream-dest")
        q = dest.stream(
            stream,
            stream_name="items",
            checkpoint_dir=str(tmp_path / "ckpt"),
            state_store=cache,
        )
        q.awaitTermination()

    run()
    arts = cache.get_destination_state_provider("stream-dest").state_artifacts
    assert arts and arts[0].stream_name == "items"  # confirmations landed
    epoch_file = tmp_path / "ckpt" / "_dest_committed_epoch"
    committed_after_first = int(epoch_file.read_text())
    assert committed_after_first >= 1  # two micro-batches delivered
    # second run, same checkpoint: no new data, epoch marker unchanged
    run()
    assert int(epoch_file.read_text()) == committed_after_first


def test_streaming_reverse_etl_distributed(spark, tmp_path, cache):
    """distributed=True routes each micro-batch through the
    partition-parallel path; per-partition STATE confirmations land in
    the destination state channel and replays deliver nothing."""
    script = tmp_path / "fake_connector.py"
    script.write_text(CONNECTOR_SCRIPT)
    src_dir = tmp_path / "dstream_src"
    src_dir.mkdir()
    spark.range(40).selectExpr("id", "concat('n-', id) AS name").coalesce(
        2
    ).write.parquet(str(src_dir / "p"))
    schema = spark.read.parquet(str(src_dir / "p")).schema

    def run():
        stream = spark.readStream.schema(schema).parquet(str(src_dir / "p"))
        dest = SparkDestination(
            SubprocessHost([sys.executable, str(script)]),
            name="dist-stream-dest",
            config={"k": "v"},
        )
        q = dest.stream(
            stream,
            stream_name="items",
            checkpoint_dir=str(tmp_path / "dckpt"),
            state_store=cache,
            distributed=True,
        )
        q.awaitTermination()

    run()
    arts = cache.get_destination_state_provider("dist-stream-dest").state_artifacts
    # per-partition scoped confirmations with the full batch accounted for
    written = [a.state["written"] for a in arts if "written" in a.state]
    assert sum(written) == 40
    epoch_file = tmp_path / "dckpt" / "_dest_committed_epoch"
    committed = int(epoch_file.read_text())
    run()  # replay: nothing new, epoch marker unchanged
    assert int(epoch_file.read_text()) == committed


FAKE_DOCKER = textwrap.dedent(
    """\
    #!/usr/bin/env python3
    # Daemon-less docker stand-in: parses `run --rm -i [-v h:c:ro]...
    # image args...`, maps container paths back to the mounted host
    # dirs, and execs the connector script given by $FAKE_CONNECTOR.
    import os, subprocess, sys
    args = sys.argv[1:]
    assert args and args[0] == "run", args
    args = args[1:]
    mounts = {}
    while args and (args[0] in ("--rm", "-i") or args[0] == "-v"):
        if args[0] == "-v":
            host, cont = args[1].split(":")[:2]
            mounts[cont] = host
            args = args[2:]
        else:
            args = args[1:]
    image, rest = args[0], args[1:]
    assert image.startswith("airbyte/"), image

    def tr(a):
        for cont, host in mounts.items():
            if a.startswith(cont + "/"):
                return host + a[len(cont):]
        return a

    cmd = [sys.executable, os.environ["FAKE_CONNECTOR"]] + [tr(a) for a in rest]
    sys.exit(subprocess.call(cmd))
    """
)


def test_docker_host_mounts_and_rewrites_file_args(tmp_path):
    from pyairbyte_spark.sources.subprocess_host import DockerHost

    cfg = tmp_path / "config.json"
    cfg.write_text("{}")
    host = DockerHost("airbyte/source-x", docker_bin="docker")
    argv = host.build_argv(["check", "--config", str(cfg)])
    assert argv[:4] == ["docker", "run", "--rm", "-i"]
    mount = f"{tmp_path.resolve()}:/airbyte/mnt/0:ro"
    assert argv[4:6] == ["-v", mount]
    assert argv[6:] == ["airbyte/source-x", "check", "--config",
                        "/airbyte/mnt/0/config.json"]
    # non-file args and missing paths pass through untouched
    assert host.build_argv(["spec"])[-2:] == ["airbyte/source-x", "spec"]


def test_docker_source_end_to_end_via_fake_daemon(tmp_path, cache, monkeypatch):
    import os

    from pyairbyte_spark.factories import get_source

    script = tmp_path / "fake_connector.py"
    script.write_text(CONNECTOR_SCRIPT)
    docker = tmp_path / "docker"
    docker.write_text(FAKE_DOCKER)
    docker.chmod(0o755)
    monkeypatch.setenv("AIRBYTE_DOCKER_BIN", str(docker))
    monkeypatch.setenv("FAKE_CONNECTOR", str(script))

    src = get_source("source-dockerized", config={"k": "v"}, docker_image=True)
    assert src.check()
    assert src.get_available_streams() == ["items"]
    res = src.read(cache, write_strategy="auto")
    assert res.record_counts.get("items", 0) > 0
