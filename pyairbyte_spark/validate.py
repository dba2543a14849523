"""Connector validation: the deep check-discover-read smoke flow.

Parity with the reference's ``airbyte/validate.py``:

- :func:`full_tests` (``validate.py:62-91``): check the connection,
  discover streams, then try reading a record from each stream until
  one yields — if NO stream produces data, raise
  ``AirbyteNoDataFromConnectorError``;
- :func:`install_only_test` (``validate.py:94-98``): the connector
  launches and answers ``spec`` — the install/entrypoint smoke without
  touching data.

The reference's pip-install round trip is subsumed by the source
resolution step itself (a source object that exists has already passed
the executable/manifest resolution the reference installs for);
``pyab-spark validate --deep`` wires this flow into the CLI.
"""

from __future__ import annotations

from typing import Any

from pyairbyte_spark import exceptions as exc
from pyairbyte_spark.sources.base import SparkSource


def install_only_test(source: SparkSource) -> dict[str, Any]:
    """The connector launches and returns a spec document."""
    spec = source.spec() if hasattr(source, "spec") else {}
    return {"spec_returned": spec is not None}


def full_tests(
    source: SparkSource, *, record_limit: int = 1
) -> dict[str, Any]:
    """check → discover → read-one-record, reporting each step.

    Tries every stream in catalog order and stops at the first one
    that yields a record; raises ``AirbyteNoDataFromConnectorError``
    when none does (same contract as reference ``validate.py:76-91``).
    """
    report: dict[str, Any] = {"check": None, "streams": [], "read_stream": None}
    report["check"] = bool(source.check())
    if not report["check"]:
        # A failed connection check is the finding — probing streams
        # anyway would surface as a misleading "no data from
        # connector" error instead of the actual check failure.
        return report
    streams = source.get_available_streams()
    report["streams"] = streams
    errors: dict[str, str] = {}
    for stream in streams:
        try:
            record = next(iter(source.get_records(stream, limit=record_limit)))
        except StopIteration:
            errors[stream] = "no records"
            continue
        except Exception as ex:  # noqa: BLE001 - per-stream probe, keep trying
            errors[stream] = str(ex)
            continue
        if record:
            report["read_stream"] = stream
            return report
        errors[stream] = "empty record"
    raise exc.AirbyteNoDataFromConnectorError(
        context={"selected_streams": streams, "errors": errors},
    )
