"""pip/venv auto-install executor tests (reference
``_executors/python.py`` VenvExecutor behavior, exercised fully offline:
a hand-built connector wheel in a local directory, installed via pip's
``PIP_NO_INDEX`` / ``PIP_FIND_LINKS`` env knobs).
"""

from __future__ import annotations

import base64
import csv
import hashlib
import io
import json
import zipfile
from pathlib import Path

import pytest

from pyairbyte_spark import exceptions as exc
from pyairbyte_spark import factories, registry
from pyairbyte_spark.sources.venv_install import (
    VenvInstaller,
    connector_pip_url,
    github_pip_url,
)

CONNECTOR_NAME = "source-wheeltest"
PACKAGE = "airbyte_source_wheeltest"
VERSION = "0.2.0"

# An Airbyte-protocol connector, shipped as a console script inside the
# wheel. Distinct fixture from test_connector_roundtrip's script-path one.
CONNECTOR_CODE = '''
import json, sys

CATALOG = {"streams": [{
    "name": "widgets",
    "json_schema": {"properties": {"id": {"type": "integer"},
                                    "label": {"type": "string"}}},
    "supported_sync_modes": ["full_refresh"],
}]}

def _out(obj):
    sys.stdout.write(json.dumps(obj) + "\\n")

def run():
    verb = sys.argv[1]
    if verb == "spec":
        _out({"type": "SPEC", "spec": {"connectionSpecification": {}}})
    elif verb == "check":
        _out({"type": "CONNECTION_STATUS",
              "connectionStatus": {"status": "SUCCEEDED"}})
    elif verb == "discover":
        _out({"type": "CATALOG", "catalog": CATALOG})
    elif verb == "read":
        for i in range(1, 6):
            _out({"type": "RECORD", "record": {"stream": "widgets",
                  "data": {"id": i, "label": f"w-{i}"}, "emitted_at": 0}})
        _out({"type": "TRACE", "trace": {"type": "STREAM_STATUS",
              "stream_status": {"stream_descriptor": {"name": "widgets"},
                                "status": "COMPLETE"}}})
'''


def build_wheel(dest_dir: Path) -> Path:
    """Hand-assemble a PEP-427 wheel (zip + dist-info) — no build
    backend needed, so the fixture works in an offline sandbox."""
    dest_dir.mkdir(parents=True, exist_ok=True)
    info = f"{PACKAGE}-{VERSION}.dist-info"
    files = {
        f"{PACKAGE}/__init__.py": CONNECTOR_CODE,
        f"{info}/METADATA": (
            f"Metadata-Version: 2.1\nName: airbyte-{CONNECTOR_NAME}\n"
            f"Version: {VERSION}\n"
        ),
        f"{info}/WHEEL": (
            "Wheel-Version: 1.0\nGenerator: pyairbyte-spark-tests\n"
            "Root-Is-Purelib: true\nTag: py3-none-any\n"
        ),
        f"{info}/entry_points.txt": (
            f"[console_scripts]\n{CONNECTOR_NAME} = {PACKAGE}:run\n"
        ),
    }
    rows = []
    for path, content in files.items():
        digest = hashlib.sha256(content.encode()).digest()
        b64 = base64.urlsafe_b64encode(digest).rstrip(b"=").decode()
        rows.append((path, f"sha256={b64}", str(len(content.encode()))))
    rows.append((f"{info}/RECORD", "", ""))
    record = io.StringIO()
    csv.writer(record).writerows(rows)
    whl = dest_dir / f"{PACKAGE}-{VERSION}-py3-none-any.whl"
    with zipfile.ZipFile(whl, "w") as z:
        for path, content in files.items():
            z.writestr(path, content)
        z.writestr(f"{info}/RECORD", record.getvalue())
    return whl


@pytest.fixture(scope="module")
def wheel_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wheels")
    build_wheel(d)
    return d


@pytest.fixture()
def offline_pip(wheel_dir, monkeypatch):
    monkeypatch.setenv("PIP_NO_INDEX", "1")
    monkeypatch.setenv("PIP_FIND_LINKS", str(wheel_dir))
    monkeypatch.setenv("PIP_DISABLE_PIP_VERSION_CHECK", "1")
    return wheel_dir


def test_pip_url_helpers():
    assert github_pip_url(package_name="airbyte-lib") == (
        "git+https://github.com/airbytehq/airbyte.git#egg=airbyte-lib"
    )
    assert connector_pip_url("github", "my-branch") == (
        "git+https://github.com/airbytehq/airbyte.git@my-branch"
        "#egg=source-github"
        "&subdirectory=airbyte-integrations/connectors/source-github"
    )


def test_installer_lifecycle(offline_pip, tmp_path):
    installer = VenvInstaller(CONNECTOR_NAME, install_root=tmp_path)
    assert installer.installed_version() is None
    installer.ensure_installed()
    assert installer.connector_path.exists()
    assert installer.installed_version(refresh=True) == VERSION

    host = installer.host()
    assert host.check({}) is True
    catalog = host.discover({})
    assert catalog["streams"][0]["name"] == "widgets"

    # idempotent: a second ensure reuses the venv (no reinstall marker).
    before = installer.connector_path.stat().st_mtime_ns
    installer.ensure_installed()
    assert installer.connector_path.stat().st_mtime_ns == before

    installer.uninstall()
    assert not installer.venv_path.exists()


@pytest.mark.slow
def test_installer_repairs_partial_install(offline_pip, tmp_path):
    installer = VenvInstaller(CONNECTOR_NAME, install_root=tmp_path)
    installer.ensure_installed()
    installer.connector_path.unlink()  # simulate a broken install
    with pytest.raises(exc.AirbyteConnectorInstallationError):
        installer.ensure_installed(auto_fix=False)
    installer.ensure_installed()  # auto_fix reinstalls
    assert installer.connector_path.exists()


def test_installer_version_enforcement(offline_pip, tmp_path):
    installer = VenvInstaller(
        CONNECTOR_NAME,
        install_root=tmp_path,
        pip_url=f"airbyte-{CONNECTOR_NAME}",
        target_version="9.9.9",
    )
    with pytest.raises(exc.AirbyteConnectorInstallationError):
        installer.ensure_installed()


def test_install_failure_cleans_up(offline_pip, tmp_path):
    installer = VenvInstaller(
        "source-nonexistent-pkg", install_root=tmp_path,
        pip_url="airbyte-source-nonexistent-pkg",
    )
    with pytest.raises(exc.AirbyteConnectorInstallationError):
        installer.install()
    assert not installer.venv_path.exists()  # half-built venv removed


@pytest.mark.slow
def test_get_source_auto_installs_and_reads(offline_pip, tmp_path, cache):
    registry.register_connectors(
        {
            "sources": [
                {
                    "dockerRepository": f"airbyte/{CONNECTOR_NAME}",
                    "dockerImageTag": VERSION,
                    "language": "python",
                    "remoteRegistries": {"pypi": {"enabled": True}},
                }
            ]
        }
    )
    src = factories.get_source(CONNECTOR_NAME, install_root=tmp_path)
    assert src.check()
    assert src.get_available_streams() == ["widgets"]
    res = src.read(cache, write_strategy="auto")
    assert res.record_counts["widgets"] == 5
    labels = {r["id"]: r["label"] for r in cache.get_records("widgets")}
    assert labels[3] == "w-3"

    # Second resolution must REUSE the venv: break pip (empty wheel dir)
    # and resolve again — no install happens, the connector still runs.
    with pytest.raises(exc.AirbyteConnectorNotRegisteredError):
        factories.get_source("source-not-in-registry", install_root=tmp_path)
    import os

    os.environ["PIP_FIND_LINKS"] = str(tmp_path / "empty")
    src2 = factories.get_source(CONNECTOR_NAME, install_root=tmp_path)
    assert src2.check()
