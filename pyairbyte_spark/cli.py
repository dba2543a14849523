"""Command-line interface.

Parity with the reference's ``pyab`` CLI (``airbyte/cli/pyab.py``):

- ``validate``  — check a source (catalog discovery + connectivity +
  optional sample read), reference ``airbyte/validate.py``;
- ``benchmark`` — records/sec through the pipeline with cache+state
  disabled-equivalent (tmp warehouse), reference ``pyab.py:438-533``;
- ``sync``      — source → cache with a write strategy;
- ``sql``       — guarded read-only query against a warehouse.

Source specifiers: ``faker`` / ``fixture`` / ``benchmark:N`` /
``manifest:/path.json`` / an argv for a connector subprocess.
"""

from __future__ import annotations

import argparse
import json
import shlex
import sys
import tempfile
import time


def _resolve_source(spec: str):
    from pyairbyte_spark.sources import (
        SourceFaker,
        SourceTestFixture,
        get_benchmark_source,
    )
    from pyairbyte_spark.sources.connector import ConnectorSource
    from pyairbyte_spark.sources.declarative import DeclarativeSource
    from pyairbyte_spark.sources.subprocess_host import SubprocessHost

    if spec == "faker":
        return SourceFaker()
    if spec == "fixture":
        return SourceTestFixture()
    if spec.startswith("benchmark"):
        n = spec.split(":", 1)[1] if ":" in spec else "5e5"
        return get_benchmark_source(n)
    if spec.startswith("manifest:"):
        return DeclarativeSource(spec.split(":", 1)[1])
    return ConnectorSource(SubprocessHost(shlex.split(spec)))


def cmd_validate(args) -> int:
    src = _resolve_source(args.source)
    if args.deep:
        # Reference validate.py full flow: check → discover → prove at
        # least one stream yields data.
        from pyairbyte_spark.validate import full_tests

        report = full_tests(src)
        print(json.dumps(report, default=str, indent=1))
        return 0 if report["check"] else 1
    ok = src.check()
    streams = src.get_available_streams()
    print(f"connection: {'SUCCEEDED' if ok else 'FAILED'}")
    print(f"streams: {streams}")
    if args.sample and streams:
        samples = src.get_samples(streams[:1], limit=3)
        print(json.dumps(samples, default=str, indent=1))
    return 0 if ok else 1


def cmd_benchmark(args) -> int:
    from pyairbyte_spark import SparkCache, get_spark

    spark = get_spark("pyab-benchmark")
    src = _resolve_source(args.source)
    with tempfile.TemporaryDirectory() as td:
        cache = SparkCache(spark, td)
        t0 = time.monotonic()
        result = src.read(cache, write_strategy="append")
        dt = time.monotonic() - t0
    total = sum(result.record_counts.values())
    print(
        json.dumps(
            {
                "records": total,
                "seconds": round(dt, 3),
                "records_per_second": round(total / dt) if dt else None,
            }
        )
    )
    return 0


def cmd_sync(args) -> int:
    from pyairbyte_spark import SparkCache, get_spark

    spark = get_spark("pyab-sync")
    cache = SparkCache(spark, args.warehouse)
    src = _resolve_source(args.source)
    if args.streams:
        src.select_streams(args.streams.split(","))
    result = src.read(
        cache,
        write_strategy=args.write_strategy,
        force_full_refresh=args.full_refresh,
    )
    print(json.dumps({"record_counts": result.record_counts}))
    return 0


def cmd_destination_smoke_test(args) -> int:
    """Pump edge-case scenarios through the write path (reference
    ``pyab destination-smoke-test``, cli/pyab.py:632-720)."""
    import shlex as _shlex

    from pyairbyte_spark import SparkCache, get_spark
    from pyairbyte_spark.sources.smoke import run_destination_smoke_tests

    spark = get_spark("pyab-smoke")
    destination = None
    if args.destination and args.destination != "cache":
        from pyairbyte_spark.destinations import SparkDestination
        from pyairbyte_spark.sources.subprocess_host import SubprocessHost

        destination = SparkDestination(
            SubprocessHost(_shlex.split(args.destination)),
            name="smoke-destination",
            config=json.loads(args.config) if args.config else {},
        )
    with tempfile.TemporaryDirectory() as td:
        cache = SparkCache(spark, args.warehouse or td)
        results = run_destination_smoke_tests(
            cache, scenarios=args.scenarios, destination=destination
        )
    failed = [r for r in results if not r.ok]
    for r in results:
        line = {
            "scenario": r.name,
            "ok": r.ok,
            "expected_rows": r.expected_rows,
            "actual_rows": r.actual_rows,
        }
        if r.error:
            line["error"] = r.error
        print(json.dumps(line))
    print(
        json.dumps(
            {"passed": len(results) - len(failed), "failed": len(failed)}
        )
    )
    return 1 if failed else 0


def cmd_sql(args) -> int:
    from pyairbyte_spark import SparkCache, get_spark

    spark = get_spark("pyab-sql")
    cache = SparkCache(spark, args.warehouse)
    rows = cache.run_sql_query(args.query, max_records=args.max_records)
    for row in rows:
        print(json.dumps(row, default=str))
    return 0


def cmd_mcp(args) -> int:
    # Parity: `pyab mcp serve` (reference airbyte/mcp/server.py:332-353);
    # stdio transport by default; --http serves the Streamable HTTP
    # transport instead (reference airbyte/mcp/http_main.py:1-140).
    if args.http:
        from pyairbyte_spark.mcp_http import main as http_main

        return http_main(args.host, args.port, warehouse_dir=args.warehouse)
    from pyairbyte_spark.mcp_server import main as mcp_main

    return mcp_main(args.warehouse)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pyab-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="check a source and list streams")
    v.add_argument("source")
    v.add_argument("--sample", action="store_true")
    v.add_argument(
        "--deep",
        action="store_true",
        help="full check-discover-read validation (reference validate.py)",
    )
    v.set_defaults(fn=cmd_validate)

    b = sub.add_parser("benchmark", help="pipeline throughput (tmp cache)")
    b.add_argument("--source", default="benchmark:5e5")
    b.set_defaults(fn=cmd_benchmark)

    s = sub.add_parser("sync", help="source -> warehouse")
    s.add_argument("source")
    s.add_argument("warehouse")
    s.add_argument("--write-strategy", default="auto")
    s.add_argument("--streams")
    s.add_argument("--full-refresh", action="store_true")
    s.set_defaults(fn=cmd_sync)

    d = sub.add_parser(
        "destination-smoke-test",
        help="edge-case scenario suite through the write path",
    )
    d.add_argument(
        "--destination",
        default="cache",
        help="'cache' (in-process warehouse) or a connector argv string",
    )
    d.add_argument("--config", default=None, help="destination config JSON")
    d.add_argument("--scenarios", default="fast", help="fast | all | name,name,...")
    d.add_argument("--warehouse", default=None)
    d.set_defaults(fn=cmd_destination_smoke_test)

    q = sub.add_parser("sql", help="guarded read-only query")
    q.add_argument("warehouse")
    q.add_argument("query")
    q.add_argument("--max-records", type=int, default=100)
    q.set_defaults(fn=cmd_sql)

    i = sub.add_parser(
        "interactive",
        help="prompt-driven registry browser + sync-status console",
    )
    i.set_defaults(fn=lambda a: __import__(
        "pyairbyte_spark.mcp_interactive", fromlist=["main"]
    ).main())

    m = sub.add_parser("mcp", help="serve the MCP tool surface (stdio or --http)")
    m.add_argument("--warehouse", default=None)
    m.add_argument("--http", action="store_true", help="Streamable HTTP transport")
    m.add_argument("--host", default="127.0.0.1")
    m.add_argument("--port", type=int, default=8000)
    m.set_defaults(fn=cmd_mcp)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
