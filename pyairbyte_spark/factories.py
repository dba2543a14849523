"""Top-level factory functions mirroring the reference's public API.

``get_source`` / ``get_destination`` / ``get_default_cache`` /
``new_local_cache`` are the reference's main entry points
(``airbyte/sources/util.py:47-140``, ``airbyte/destinations/util.py``,
``airbyte/caches/util.py``). Executor resolution follows the reference's
precedence (``airbyte/_executors/util.py``): explicit ``local_executable``
/ ``argv`` / ``docker_image`` / ``source_manifest`` win; otherwise the
registry decides, and in-process sources cover the bundled fixtures.
Config is secret-hydrated on the way in (``secret_reference::`` values).
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Any

from pyairbyte_spark import exceptions as exc
from pyairbyte_spark import registry as _registry
from pyairbyte_spark.cache import SparkCache
from pyairbyte_spark.callbacks import ConfigChangeCallback
from pyairbyte_spark.destinations import SparkDestination
from pyairbyte_spark.secrets import hydrate_secrets
from pyairbyte_spark.session import get_spark
from pyairbyte_spark.sources.base import SparkSource
from pyairbyte_spark.sources.benchmark import BenchmarkSource
from pyairbyte_spark.sources.connector import ConnectorSource
from pyairbyte_spark.sources.declarative import DeclarativeSource
from pyairbyte_spark.sources.faker import SourceFaker
from pyairbyte_spark.sources.fixture import SourceTestFixture
from pyairbyte_spark.sources.subprocess_host import DockerHost, SubprocessHost
from pyairbyte_spark.sources.venv_install import VenvInstaller

DEFAULT_CACHE_ROOT = ".cache"


def get_default_cache(spark=None) -> SparkCache:
    """The shared default cache at ``.cache/default_cache`` (reference
    ``caches/util.py`` get_default_cache)."""
    return SparkCache(
        spark or get_spark(), str(Path(DEFAULT_CACHE_ROOT) / "default_cache")
    )


def new_local_cache(
    cache_name: str | None = None,
    *,
    cache_dir: str | Path | None = None,
    spark=None,
) -> SparkCache:
    """A named throwaway cache under ``.cache/`` (reference
    ``caches/util.py`` new_local_cache, incl. the identifier guard)."""
    cache_name = cache_name or "default"
    if not cache_name.replace("_", "").isalnum():
        raise exc.PyAirbyteInputError(
            message="Cache name must be alphanumeric (underscores allowed).",
            input_value=cache_name,
        )
    cache_dir = cache_dir or Path(DEFAULT_CACHE_ROOT) / cache_name
    return SparkCache(spark or get_spark(), str(cache_dir))


def get_colab_cache(
    cache_name: str = "default_cache",
    *,
    sub_dir: str = "Airbyte/cache",
    drive_name: str = "MyDrive",
    mount_path: str = "/content/drive",
    spark=None,
) -> SparkCache:
    """Cache on a mounted Google Drive (reference ``caches/colab.py``):
    syncs persist across Colab sessions and can be shared via Drive.
    Outside Colab (no mount and no ``google.colab`` module), falls back
    to a local cache under the same relative path."""
    drive_root = Path(mount_path) / drive_name
    if not drive_root.exists():
        try:  # pragma: no cover - colab-only
            from google.colab import drive  # type: ignore[import-not-found]

            drive.mount(mount_path)
        except ImportError:
            # Not running in Colab: a local stand-in keeps notebooks
            # portable instead of crashing on the missing mount.
            drive_root = Path(DEFAULT_CACHE_ROOT) / "colab" / drive_name
    cache_dir = drive_root / sub_dir / cache_name
    return SparkCache(spark or get_spark(), str(cache_dir))


def get_source(
    name: str,
    config: dict[str, Any] | None = None,
    *,
    version: str | None = None,
    pip_url: str | None = None,
    install_root: str | Path | None = None,
    install_if_missing: bool = True,
    local_executable: str | Path | None = None,
    argv: list[str] | None = None,
    docker_image: str | bool | None = None,
    source_manifest: str | dict | None = None,
    config_change_callback: ConfigChangeCallback | None = None,
) -> SparkSource:
    """Resolve a source by name (reference ``sources/util.py:47-140``).

    Resolution order matches the reference's executor precedence:
    explicit launch method first, then bundled in-process sources, then
    the registry: an already-installed per-connector venv
    (``.venv-<name>``) wins, then a same-named executable on PATH, and
    finally — for pip-installable connectors — an automatic venv
    create + pip install (reference ``_executors/python.py:27+``).
    ``pip_url=`` forces the venv path and overrides the package source
    (pip's ``PIP_NO_INDEX`` / ``PIP_FIND_LINKS`` env knobs apply, so
    air-gapped installs from a wheel directory work).
    """
    config = hydrate_secrets(config) if config else {}

    if source_manifest is not None:
        return DeclarativeSource(source_manifest, name=name)
    if local_executable is not None:
        path = shutil.which(str(local_executable)) or (
            str(local_executable) if Path(local_executable).exists() else None
        )
        if path is None:
            raise exc.AirbyteConnectorExecutableNotFoundError(
                connector_name=name, context={"executable": str(local_executable)}
            )
        return ConnectorSource(
            SubprocessHost([path], name=name),
            name=name,
            config=config,
            config_change_callback=config_change_callback,
        )
    if argv is not None:
        return ConnectorSource(
            SubprocessHost(argv, name=name),
            name=name,
            config=config,
            config_change_callback=config_change_callback,
        )
    if docker_image:
        image = f"airbyte/{name}" if docker_image is True else str(docker_image)
        return ConnectorSource(
            DockerHost(image, name=name),
            name=name,
            config=config,
            config_change_callback=config_change_callback,
        )

    # Bundled in-process sources (zero install).
    if name == "source-test":
        return SourceTestFixture()
    if name == "source-faker":
        return SourceFaker(
            seed=int(config.get("seed", 1234)), count=int(config.get("count", 200))
        )
    if name == "source-e2e-test":
        num = (
            config.get("maxMessages")
            or config.get("mock_catalog", {}).get("num_records")
            or "5e5"
        )
        return BenchmarkSource(num)

    # Registry-resolved (raises AirbyteConnectorNotRegisteredError if absent).
    meta = _registry.get_connector_metadata(name)
    installer = VenvInstaller(
        name, pip_url=pip_url, install_root=install_root, target_version=version
    )

    def _venv_source() -> SparkSource:
        return ConnectorSource(
            installer.host(),
            name=name,
            config=config,
            config_change_callback=config_change_callback,
        )

    # 1. An existing per-connector venv wins (the reference convention).
    if installer.connector_path.exists():
        installer.ensure_installed(auto_fix=False)
        return _venv_source()
    # 2. A same-named executable already on PATH (unless the caller
    #    pinned a pip source/version, which only the venv path honors).
    if pip_url is None and version is None:
        path = shutil.which(name)
        if path is not None:
            return ConnectorSource(
                SubprocessHost([path], name=name),
                name=name,
                config=config,
                config_change_callback=config_change_callback,
            )
    # 3. Auto-install into a fresh venv when the connector ships on pip.
    pip_installable = pip_url is not None or _registry.InstallType.PYTHON in (
        meta.install_types or set()
    )
    if install_if_missing and pip_installable:
        installer.ensure_installed()
        return _venv_source()
    raise exc.AirbyteConnectorExecutableNotFoundError(
        connector_name=name,
        guidance=(
            f"Install the connector (pip-installable: {pip_installable}) or put "
            f"an executable named '{name}' on PATH."
        ),
    )


def get_destination(
    name: str,
    config: dict[str, Any] | None = None,
    *,
    local_executable: str | Path | None = None,
    argv: list[str] | None = None,
    docker_image: str | bool | None = None,
    config_change_callback: ConfigChangeCallback | None = None,
) -> SparkDestination:
    """Resolve a destination connector (reference ``destinations/util.py``)."""
    config = hydrate_secrets(config) if config else {}
    if local_executable is not None:
        path = shutil.which(str(local_executable)) or (
            str(local_executable) if Path(local_executable).exists() else None
        )
        if path is None:
            raise exc.AirbyteConnectorExecutableNotFoundError(
                connector_name=name, context={"executable": str(local_executable)}
            )
        argv = [path]
    elif docker_image:
        image = f"airbyte/{name}" if docker_image is True else str(docker_image)
        return SparkDestination(
            DockerHost(image, name=name),
            name=name,
            config=config,
            config_change_callback=config_change_callback,
        )
    elif argv is None:
        path = shutil.which(name)
        if path is None:
            raise exc.AirbyteConnectorExecutableNotFoundError(connector_name=name)
        argv = [path]
    return SparkDestination(
        SubprocessHost(argv, name=name),
        name=name,
        config=config,
        config_change_callback=config_change_callback,
    )
