"""pip/venv connector auto-install — the Python launch method.

Parity with the reference's venv executor surface
(``airbyte/_executors/python.py:27-344`` VenvExecutor,
``airbyte/_util/venv_util.py`` get_bin_dir,
``airbyte/_util/pip_util.py`` github/connector pip URLs):
``get_source("source-foo")`` with no explicit launch method creates
``.venv-source-foo/`` under an install root, pip-installs the connector
package into it, and launches the venv's console script through
:class:`~pyairbyte_spark.sources.subprocess_host.SubprocessHost`.

The install is plain ``python -m venv`` + the venv interpreter's own
``pip`` — no extra tooling assumed. pip's standard environment knobs
(``PIP_NO_INDEX``, ``PIP_FIND_LINKS``, ``PIP_INDEX_URL``) pass straight
through, so air-gapped installs from a local wheel directory work
without special-casing.
"""

from __future__ import annotations

import os
import shlex
import shutil
import subprocess
import sys
from pathlib import Path

from pyairbyte_spark import exceptions as exc
from pyairbyte_spark.sources.subprocess_host import SubprocessHost


def _probe_package_name(pip_url: str, connector_name: str) -> str | None:
    """Distribution name to probe with importlib.metadata.

    Requirement-style pip_urls strip their version/extras specifiers;
    VCS/URL pip_urls (``git+https://...``) yield the ``#egg=``/
    ``&egg=`` fragment when present and otherwise ``None`` — probing
    with the whole URL can never match a distribution name, so the
    caller falls back to the connector-name candidates.
    """
    first = shlex.split(pip_url)[0] if pip_url.strip() else ""
    if "://" in first or first.startswith(("git+", "hg+", "svn+", "bzr+")):
        for part in first.replace("#", "&").split("&"):
            if part.startswith("egg="):
                return part[4:] or None
        return None
    for sep in ("==", ">=", "<=", "~=", "!=", ">", "<", "["):
        if sep in first:
            first = first.split(sep)[0]
    return first.strip() or None


def get_bin_dir(venv_path: Path) -> Path:
    """Executable directory inside a venv (``Scripts`` on Windows)."""
    if os.name == "nt":  # pragma: no cover - no Windows in CI
        return venv_path / "Scripts"
    return venv_path / "bin"


def github_pip_url(
    owner: str = "airbytehq",
    repo: str = "airbyte",
    *,
    package_name: str,
    branch_or_ref: str | None = None,
    subdirectory: str | None = None,
) -> str:
    """pip VCS URL for a package living inside a GitHub monorepo."""
    url = f"git+https://github.com/{owner}/{repo}.git"
    if branch_or_ref:
        url += f"@{branch_or_ref}"
    sep = "#"
    if package_name:
        url += f"{sep}egg={package_name}"
        sep = "&"
    if subdirectory:
        url += f"{sep}subdirectory={subdirectory}"
    return url


def connector_pip_url(connector_name: str, branch: str, *, owner: str | None = None) -> str:
    """pip URL for a connector in the main airbyte monorepo layout."""
    if not connector_name.startswith(("source-", "destination-")):
        connector_name = f"source-{connector_name}"
    return github_pip_url(
        owner=owner or "airbytehq",
        repo="airbyte",
        branch_or_ref=branch,
        package_name=connector_name,
        subdirectory=f"airbyte-integrations/connectors/{connector_name}",
    )


class VenvInstaller:
    """Create / reuse a per-connector virtualenv and expose its CLI.

    The venv lives at ``<install_root>/.venv-<name>`` and is expected to
    contain a console script named exactly ``<name>`` after install —
    the Airbyte packaging convention the reference relies on.
    """

    def __init__(
        self,
        name: str,
        *,
        pip_url: str | None = None,
        install_root: str | Path | None = None,
        target_version: str | None = None,
    ) -> None:
        self.name = name
        self.target_version = target_version
        base = pip_url or f"airbyte-{name}"
        if pip_url is None and target_version:
            base += f"=={target_version}"
        self.pip_url = base
        root = install_root or os.environ.get("AIRBYTE_INSTALL_ROOT") or Path.cwd()
        self.install_root = Path(root)
        self.reported_version: str | None = None

    # -- layout --------------------------------------------------------------

    @property
    def venv_path(self) -> Path:
        return self.install_root / f".venv-{self.name}"

    @property
    def interpreter_path(self) -> Path:
        return get_bin_dir(self.venv_path) / "python"

    @property
    def connector_path(self) -> Path:
        return get_bin_dir(self.venv_path) / self.name

    # -- install lifecycle ---------------------------------------------------

    def _run(self, args: list[str]) -> None:
        result = subprocess.run(args, check=False, capture_output=True, text=True)
        if result.returncode != 0:
            raise exc.AirbyteConnectorInstallationError(
                connector_name=self.name,
                context={
                    "args": args,
                    "exit_code": result.returncode,
                    "stderr_tail": result.stderr[-2000:],
                },
            )

    def install(self) -> None:
        """``python -m venv`` + ``pip install <pip_url>`` into it.

        A failed install removes the half-built venv so the next attempt
        starts clean instead of being mistaken for a working install.
        """
        self.install_root.mkdir(parents=True, exist_ok=True)
        self._run([sys.executable, "-m", "venv", str(self.venv_path)])
        try:
            self._run(
                [str(self.interpreter_path), "-m", "pip", "install", "--quiet"]
                + shlex.split(self.pip_url)
            )
        except exc.AirbyteConnectorInstallationError:
            self.uninstall()
            raise
        self.reported_version = self.installed_version(refresh=True)

    def uninstall(self) -> None:
        if self.venv_path.exists():
            shutil.rmtree(self.venv_path)
        self.reported_version = None

    def installed_version(self, *, refresh: bool = False) -> str | None:
        """Package version as importlib.metadata inside the venv sees it."""
        if self.reported_version and not refresh:
            return self.reported_version
        if not self.interpreter_path.exists():
            return None
        package = _probe_package_name(self.pip_url, self.name)
        names = [n for n in (package, f"airbyte-{self.name}", self.name) if n]
        # de-dup, order-preserving
        names = list(dict.fromkeys(names))
        probe = (
            "from importlib.metadata import version, PackageNotFoundError\n"
            "import sys\n"
            f"names = {names!r}\n"
            "for n in names:\n"
            "    try:\n"
            "        print(version(n)); sys.exit(0)\n"
            "    except PackageNotFoundError:\n"
            "        pass\n"
            "sys.exit(1)\n"
        )
        result = subprocess.run(
            [str(self.interpreter_path), "-c", probe],
            check=False,
            capture_output=True,
            text=True,
        )
        return result.stdout.strip() or None if result.returncode == 0 else None

    def ensure_installed(self, *, auto_fix: bool = True) -> None:
        """Install if missing; repair a venv whose console script vanished
        (partial install); enforce ``target_version`` when set."""
        if not self.venv_path.exists():
            if not auto_fix:
                raise exc.AirbyteConnectorInstallationError(
                    message="Virtual environment does not exist.",
                    connector_name=self.name,
                    context={"venv_path": str(self.venv_path)},
                )
            self.install()
        elif not self.connector_path.exists():
            if not auto_fix:
                raise exc.AirbyteConnectorInstallationError(
                    message="Connector executable missing from virtual environment.",
                    connector_name=self.name,
                    context={"connector_path": str(self.connector_path)},
                )
            self.uninstall()
            self.install()
        if not self.connector_path.exists():
            raise exc.AirbyteConnectorInstallationError(
                message="Connector executable missing after install.",
                connector_name=self.name,
                context={"connector_path": str(self.connector_path)},
            )
        if self.target_version:
            found = self.installed_version(refresh=True)
            if found != self.target_version:
                raise exc.AirbyteConnectorInstallationError(
                    message="Installed connector version does not match target.",
                    connector_name=self.name,
                    context={"target": self.target_version, "installed": found},
                )

    # -- launch --------------------------------------------------------------

    def host(self, *, env: dict[str, str] | None = None) -> SubprocessHost:
        """A :class:`SubprocessHost` running the venv's console script."""
        return SubprocessHost([str(self.connector_path)], env=env, name=self.name)
