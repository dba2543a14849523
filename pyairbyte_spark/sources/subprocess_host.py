"""Connector subprocess host — the one true process boundary.

Parity with the reference's executor plumbing
(``airbyte/_executors/base.py:65-169``): launch a connector command,
stream JSONL from its stdout, drain stderr on a daemon thread, support
early termination, and (for destination connectors) pump messages into
stdin from a daemon thread while stdout is drained — the
deadlock-avoidance pattern of ``_executors/base.py:36-102``.

The host is transport-only: it yields raw lines; protocol parsing lives
in :mod:`pyairbyte_spark.sources.messages`. Docker / venv / local-path
launch methods (reference ``_executors/docker.py``, ``python.py``,
``local.py``) all reduce to an argv here.
"""

from __future__ import annotations

import json
import subprocess
import tempfile
import threading
from collections.abc import Iterable, Iterator
from pathlib import Path
from typing import Any


class ConnectorError(RuntimeError):
    pass


class SubprocessHost:
    def __init__(
        self,
        argv: list[str],
        *,
        env: dict[str, str] | None = None,
        name: str | None = None,
    ) -> None:
        self.argv = argv
        self.env = env
        # Log-file identity for this connector's stderr (reference
        # routes connector stderr to per-connector log files,
        # logs.py:281-330 + _executors/base.py). Lazy: no file is
        # opened until the connector actually emits stderr.
        self.name = name
        self._logger = None
        self._stop = threading.Event()
        self._stderr_tail: list[str] = []

    def _stderr_logger(self):
        if self._logger is None:
            from pyairbyte_spark.logs import new_passthrough_file_logger

            self._logger = new_passthrough_file_logger(
                self.name or Path(self.argv[-1]).stem or "connector"
            )
        return self._logger

    def stop(self) -> None:
        """Early termination (reference base.py:799-804 stop_event)."""
        self._stop.set()

    def build_argv(self, args: list[str]) -> list[str]:
        """Full command line for one invocation — the launch-method
        seam (docker rewrites file args, see :class:`DockerHost`)."""
        return self.argv + args

    def _drain_stderr(self, proc: subprocess.Popen) -> None:
        assert proc.stderr is not None
        logger = None
        for line in proc.stderr:
            self._stderr_tail.append(line)
            if len(self._stderr_tail) > 100:
                self._stderr_tail.pop(0)
            if logger is None:
                logger = self._stderr_logger()
            logger.info(line.rstrip("\n"))

    def execute(
        self,
        args: list[str],
        *,
        stdin_lines: Iterable[str] | None = None,
    ) -> Iterator[str]:
        """Run `argv + args`, yield stdout lines.

        With ``stdin_lines``, a daemon pump thread writes them to the
        process stdin while the caller drains stdout (destination-write
        shape, §3.3).
        """
        proc = subprocess.Popen(
            self.build_argv(args),
            stdin=subprocess.PIPE if stdin_lines is not None else subprocess.DEVNULL,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=self.env,
        )
        t_err = threading.Thread(
            target=self._drain_stderr, args=(proc,), daemon=True
        )
        t_err.start()

        if stdin_lines is not None:

            def pump() -> None:
                try:
                    assert proc.stdin is not None
                    for line in stdin_lines:
                        if self._stop.is_set():
                            break
                        proc.stdin.write(line.rstrip("\n") + "\n")
                    proc.stdin.close()
                except BrokenPipeError:
                    pass

            threading.Thread(target=pump, daemon=True).start()

        assert proc.stdout is not None
        try:
            for line in proc.stdout:
                if self._stop.is_set():
                    proc.terminate()
                    break
                yield line.rstrip("\n")
        finally:
            proc.stdout.close()
            rc = proc.wait()
            # the process has exited, so stderr is at EOF — wait for
            # the drain thread to finish writing, or the connector log
            # file and the error tail below can miss the last lines
            # (surfaced as an under-load flake in the shuffled suite)
            t_err.join(timeout=10)
            if rc not in (0, -15) and not self._stop.is_set():
                tail = "".join(self._stderr_tail[-20:])
                raise ConnectorError(f"connector exited {rc}; stderr tail:\n{tail}")

    # -- protocol verbs (reference base.py:218-236) --------------------------

    def spec(self) -> dict[str, Any]:
        for line in self.execute(["spec"]):
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if obj.get("type") == "SPEC":
                return obj["spec"]
        raise ConnectorError("no SPEC message")

    def discover(self, config: dict[str, Any]) -> dict[str, Any]:
        with tempfile.TemporaryDirectory() as td:
            cfg = Path(td) / "config.json"
            cfg.write_text(json.dumps(config))
            for line in self.execute(["discover", "--config", str(cfg)]):
                try:
                    obj = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if obj.get("type") == "CATALOG":
                    return obj["catalog"]
        raise ConnectorError("no CATALOG message")

    def check(self, config: dict[str, Any]) -> bool:
        with tempfile.TemporaryDirectory() as td:
            cfg = Path(td) / "config.json"
            cfg.write_text(json.dumps(config))
            for line in self.execute(["check", "--config", str(cfg)]):
                try:
                    obj = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if obj.get("type") == "CONNECTION_STATUS":
                    return obj["connectionStatus"].get("status") == "SUCCEEDED"
        return False

    def read(
        self,
        config: dict[str, Any],
        configured_catalog: dict[str, Any],
        state: list[dict[str, Any]] | None = None,
    ) -> Iterator[str]:
        """`read --config f --catalog f [--state f]` → stdout JSONL lines.

        Temp-file plumbing parity: ``airbyte/sources/base.py:758-806``.
        """
        td = tempfile.TemporaryDirectory()
        base = Path(td.name)
        (base / "config.json").write_text(json.dumps(config))
        (base / "catalog.json").write_text(json.dumps(configured_catalog))
        args = [
            "read",
            "--config", str(base / "config.json"),
            "--catalog", str(base / "catalog.json"),
        ]
        if state is not None:
            (base / "state.json").write_text(json.dumps(state))
            args += ["--state", str(base / "state.json")]
        try:
            yield from self.execute(args)
        finally:
            td.cleanup()


class DockerHost(SubprocessHost):
    """Docker launch method (reference ``_executors/docker.py:21-100``).

    Local file arguments (``--config``/``--catalog``/``--state`` temp
    files) are invisible inside the container, so each one's parent
    directory is volume-mounted read-only under :attr:`MOUNT_ROOT` and
    the argument rewritten to the in-container path — the reference's
    ``-v`` mapping. The binary is overridable (``docker_bin`` /
    ``$AIRBYTE_DOCKER_BIN``) so the path is testable without a daemon.
    """

    MOUNT_ROOT = "/airbyte/mnt"

    def __init__(
        self,
        image: str,
        *,
        docker_bin: str | None = None,
        env: dict[str, str] | None = None,
        name: str | None = None,
    ) -> None:
        import os

        binary = docker_bin or os.environ.get("AIRBYTE_DOCKER_BIN", "docker")
        super().__init__([binary, "run", "--rm", "-i"], env=env, name=name)
        self.image = image

    def build_argv(self, args: list[str]) -> list[str]:
        mounts: list[str] = []
        rewritten: list[str] = []
        mounted: dict[str, str] = {}
        for a in args:
            p = Path(a)
            if not a.startswith("-") and p.is_file():
                host_dir = str(p.parent.resolve())
                cdir = mounted.get(host_dir)
                if cdir is None:
                    cdir = f"{self.MOUNT_ROOT}/{len(mounted)}"
                    mounted[host_dir] = cdir
                    mounts += ["-v", f"{host_dir}:{cdir}:ro"]
                rewritten.append(f"{cdir}/{p.name}")
            else:
                rewritten.append(a)
        return self.argv + mounts + [self.image] + rewritten
