"""Secrets, registry, exceptions, and top-level factory parity.

Mirrors the reference's test intent for its ``secrets/`` and ``registry``
modules: resolution order, masking, hydration
(``airbyte/secrets/util.py:63-140``, ``hydration.py:20-74``), registry
lookup and failure modes (``airbyte/registry.py:262-340``), and the
``get_source`` factory precedence (``airbyte/sources/util.py:47-140``).
"""

from __future__ import annotations

import json

import pytest

from pyairbyte_spark import exceptions as exc
from pyairbyte_spark import factories, registry, secrets
from pyairbyte_spark.secrets import (
    CustomSecretManager,
    DotenvSecretManager,
    EnvVarSecretManager,
    SecretString,
    get_secret,
    hydrate_secrets,
)
from pyairbyte_spark.sources.connector import ConnectorSource
from pyairbyte_spark.sources.faker import SourceFaker


@pytest.fixture(autouse=True)
def _isolate_secret_sources():
    saved = list(secrets._SECRETS_SOURCES)
    secrets._SECRETS_SOURCES.clear()
    yield
    secrets._SECRETS_SOURCES.clear()
    secrets._SECRETS_SOURCES.extend(saved)


# -- SecretString -----------------------------------------------------------


def test_secret_string_masked_repr():
    s = SecretString("hunter2")
    assert repr(s) == "<SecretString: ****>"
    assert "hunter2" not in repr({"password": s})
    assert f"{s}" == "hunter2"  # explicit conversion exposes (documented)
    assert bool(SecretString("")) is True
    assert SecretString("").is_empty()


def test_secret_string_json_helpers():
    s = SecretString('{"k": 1}')
    assert s.is_json()
    assert s.parse_json() == {"k": 1}
    assert not SecretString("nope").is_json()
    with pytest.raises(exc.PyAirbyteInputError):
        SecretString("nope").parse_json()


# -- managers & resolution --------------------------------------------------


def test_env_var_manager(monkeypatch):
    monkeypatch.setenv("PA_SPARK_TEST_SECRET", "s3cr3t")
    assert EnvVarSecretManager().get_secret("PA_SPARK_TEST_SECRET") == "s3cr3t"
    assert EnvVarSecretManager().get_secret("PA_SPARK_MISSING") is None


def test_dotenv_manager(tmp_path):
    env_file = tmp_path / ".env"
    env_file.write_text(
        "# comment\nexport API_KEY='abc'\nPLAIN=value\nBAD LINE\nQUOTED=\"x y\"\n"
    )
    mgr = DotenvSecretManager(env_file)
    assert mgr.get_secret("API_KEY") == "abc"
    assert mgr.get_secret("PLAIN") == "value"
    assert mgr.get_secret("QUOTED") == "x y"
    assert mgr.get_secret("MISSING") is None
    assert DotenvSecretManager(tmp_path / "nope.env").get_secret("X") is None


def test_get_secret_priority_and_prefix(monkeypatch):
    monkeypatch.setenv("SHARED_NAME", "from_env")

    class Override(CustomSecretManager):
        name = "override"

        def get_secret(self, secret_name):
            return SecretString("from_custom") if secret_name == "SHARED_NAME" else None

    Override()  # auto-registers at the front (reference custom.py:12-60)
    assert get_secret("SHARED_NAME") == "from_custom"
    # hydration prefix is stripped before lookup (reference util.py:87-90)
    assert get_secret("secret_reference::SHARED_NAME") == "from_custom"
    secrets.disable_secret_source("override")
    assert get_secret("SHARED_NAME") == "from_env"


def test_get_secret_default_and_not_found():
    assert get_secret("PA_SPARK_NO_SUCH", default="fallback") == "fallback"
    with pytest.raises(exc.PyAirbyteSecretNotFoundError) as ei:
        get_secret("PA_SPARK_NO_SUCH", allow_prompt=False)
    assert "PA_SPARK_NO_SUCH" in str(ei.value)
    assert secrets.try_get_secret("PA_SPARK_NO_SUCH") is None
    assert not secrets.is_secret_available("PA_SPARK_NO_SUCH")


def test_get_secret_explicit_sources(monkeypatch):
    monkeypatch.setenv("ONLY_ENV", "v")
    assert get_secret("ONLY_ENV", sources=[secrets.SecretSourceEnum.ENV]) == "v"
    with pytest.raises(exc.PyAirbyteInputError):
        get_secret("ONLY_ENV", sources=["bogus-source"])


# -- hydration --------------------------------------------------------------


def test_hydrate_secrets_nested(monkeypatch):
    monkeypatch.setenv("DB_PASSWORD", "pw123")
    config = {
        "host": "db.example.com",
        "credentials": {"password": "secret_reference::DB_PASSWORD"},
        "tunnels": [{"key": "secret_reference::DB_PASSWORD"}, {"plain": "x"}],
    }
    out = hydrate_secrets(config)
    assert out["credentials"]["password"] == "pw123"
    assert out["tunnels"][0]["key"] == "pw123"
    # original untouched (reference hydration.py:44-46)
    assert config["credentials"]["password"].startswith("secret_reference::")


def test_deep_update():
    target = {"a": {"x": 1, "y": 2}, "b": 3}
    secrets.deep_update(target, {"a": {"y": 20, "z": 30}, "c": 4})
    assert target == {"a": {"x": 1, "y": 20, "z": 30}, "b": 3, "c": 4}


# -- exceptions -------------------------------------------------------------


def test_exception_rendering():
    err = exc.AirbyteConnectorNotRegisteredError(
        connector_name="source-nope", available_connectors=["source-test"]
    )
    text = str(err)
    assert "not registered" in text
    assert "local_executable" in text  # guidance line
    err2 = exc.PyAirbyteInputError(message="Bad value.", context={"value": 42})
    assert "Bad value." in str(err2) and "42" in str(err2)
    assert isinstance(err2, ValueError)


# -- registry ---------------------------------------------------------------


def test_registry_builtins():
    names = registry.get_available_connectors()
    assert {"source-test", "source-faker", "source-e2e-test"} <= set(names)
    meta = registry.get_connector_metadata("source-faker")
    assert meta.default_install_type == registry.InstallType.PYTHON


def test_registry_unknown_raises():
    with pytest.raises(exc.AirbyteConnectorNotRegisteredError):
        registry.get_connector_metadata("source-definitely-not-real")


def test_registry_local_file(tmp_path, monkeypatch):
    doc = {
        "sources": [
            {
                "dockerRepository": "airbyte/source-pokeapi",
                "dockerImageTag": "1.0.0",
                "language": "python",
                "remoteRegistries": {"pypi": {"enabled": True}},
            },
            {
                "dockerRepository": "airbyte/source-mysql",
                "dockerImageTag": "3.0.0",
                "language": "java",
            },
        ],
        "destinations": [
            {
                "dockerRepository": "airbyte/destination-duckdb",
                "dockerImageTag": "0.4.0",
                "language": "manifest-only",
            }
        ],
    }
    path = tmp_path / "registry.json"
    path.write_text(json.dumps(doc))
    monkeypatch.setenv("AIRBYTE_LOCAL_REGISTRY", str(path))
    cache = registry._get_registry_cache(force_refresh=True)
    try:
        assert cache["source-pokeapi"].latest_available_version == "1.0.0"
        assert registry.get_connector_metadata("source-pokeapi").default_install_type == (
            registry.InstallType.PYTHON
        )
        # java connector: docker-only install (no pypi)
        assert "source-mysql" in registry.get_available_connectors("docker")
        assert "source-mysql" not in registry.get_available_connectors("python")
        # manifest-only → yaml default
        assert registry.get_connector_metadata("destination-duckdb").default_install_type == (
            registry.InstallType.YAML
        )
        # default filter = runnable without docker
        assert "source-mysql" not in registry.get_available_connectors()
    finally:
        monkeypatch.delenv("AIRBYTE_LOCAL_REGISTRY")
        registry._get_registry_cache(force_refresh=True)


# -- factories --------------------------------------------------------------


def test_get_source_builtin_and_hydrated(monkeypatch):
    monkeypatch.setenv("FAKER_COUNT", "7")
    src = factories.get_source("source-faker", {"count": "secret_reference::FAKER_COUNT"})
    assert isinstance(src, SourceFaker)
    assert src.count == 7


def test_get_source_argv_and_failures(tmp_path):
    src = factories.get_source("source-x", {}, argv=["/bin/cat"])
    assert isinstance(src, ConnectorSource)
    assert src.executor.argv == ["/bin/cat"]
    with pytest.raises(exc.AirbyteConnectorNotRegisteredError):
        factories.get_source("source-definitely-not-real")
    with pytest.raises(exc.AirbyteConnectorExecutableNotFoundError):
        factories.get_source("source-y", local_executable=tmp_path / "missing")


def test_new_local_cache_name_guard(spark, tmp_path):
    with pytest.raises(exc.PyAirbyteInputError):
        factories.new_local_cache("bad name!")
    cache = factories.new_local_cache("ok_name", cache_dir=tmp_path / "c", spark=spark)
    assert cache.warehouse_dir.endswith("c")


def test_top_level_exports():
    import pyairbyte_spark as pas

    for name in pas.__all__:
        assert getattr(pas, name, None) is not None, name
