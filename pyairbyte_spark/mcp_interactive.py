"""Prompt-driven interactive console: registry browser + sync status.

The reference ships an interactive UI layer for its MCP server
(``airbyte/mcp/interactive/``): a connector-registry browser with
keyword / connector-type / support-level filters and per-connector
detail (``_registry_ui.py:89-216``), a connection sync-history view
with humanized bytes/records (``_sync_history_ui.py:48-221``), and a
workspace sync-status dashboard with per-connection success rates and
problem flagging (``_workspace_sync_status_ui.py:79-370``). Those are
built on a proprietary-styled component kit; this module re-expresses
the same capability as a dependency-free, prompt-driven console over
injectable text streams — scriptable from tests and usable over any
dumb terminal — sharing the data layer (registry, CloudWorkspace) with
the MCP tools in :mod:`pyairbyte_spark.mcp_server`.

Commands::

    connectors [keyword]      list the registry (current filters apply)
    type source|destination|* connector-type filter
    support <level|*>         min support level (certified|community|archived)
    page <n>                  page through long listings
    select <name>             one connector's detail card
    history <connection> [n]  sync-job history for a connection
    status                    workspace dashboard (all connections)
    help / quit
"""

from __future__ import annotations

import shlex
import sys
from dataclasses import dataclass, field
from enum import Enum
from typing import IO, Any

PAGE_SIZE = 20


class SupportLevel(str, Enum):
    """Support levels ordered by precedence (parity:
    ``mcp/interactive/_shared_models.py``)."""

    ARCHIVED = "archived"
    COMMUNITY = "community"
    CERTIFIED = "certified"

    @property
    def precedence(self) -> int:
        return _SUPPORT_PRECEDENCE[self]

    @classmethod
    def parse(cls, value: str) -> SupportLevel:
        """Keyword or legacy integer precedence."""
        try:
            return cls(value.lower())
        except ValueError:
            pass
        try:
            return next(
                lvl for lvl, p in _SUPPORT_PRECEDENCE.items() if p == int(value)
            )
        except (ValueError, StopIteration):
            valid = ", ".join(m.value for m in cls)
            raise ValueError(
                f"unrecognized support level {value!r}; expected one of "
                f"{valid} or an integer precedence"
            ) from None


_SUPPORT_PRECEDENCE = {
    SupportLevel.ARCHIVED: 100,
    SupportLevel.COMMUNITY: 200,
    SupportLevel.CERTIFIED: 300,
}


def format_bytes(n: int | float) -> str:
    """Humanize a byte count (``_sync_history_ui.py:48-58`` behavior)."""
    n = float(n)
    for unit in ("B", "KB", "MB", "GB", "TB", "PB"):
        if abs(n) < 1024 or unit == "PB":
            return f"{n:.0f} {unit}" if unit == "B" else f"{n:.1f} {unit}"
        n /= 1024
    return f"{n:.1f} PB"  # pragma: no cover - loop always returns


def format_records(n: int | float) -> str:
    """Humanize a record count (``_sync_history_ui.py:59-67``)."""
    n = float(n)
    if abs(n) >= 1e9:
        return f"{n / 1e9:.1f}B"
    if abs(n) >= 1e6:
        return f"{n / 1e6:.1f}M"
    if abs(n) >= 1e3:
        return f"{n / 1e3:.1f}K"
    return str(int(n))


def _text_table(headers: list[str], rows: list[list[Any]]) -> str:
    cells = [[str(c) if c is not None else "" for c in r] for r in rows]
    widths = [
        max(len(h), *(len(r[i]) for r in cells)) if cells else len(h)
        for i, h in enumerate(headers)
    ]
    def line(r: list[str]) -> str:
        return "  ".join(c.ljust(w) for c, w in zip(r, widths)).rstrip()

    sep = "  ".join("-" * w for w in widths)
    return "\n".join([line(headers), sep, *(line(r) for r in cells)])


# -- sync status model (parity: _workspace_sync_status_ui.py:79-115) ----------


@dataclass
class ConnectionSyncStatus:
    connection_id: str
    name: str
    latest_status: str | None
    n_jobs: int
    n_succeeded: int
    rows_synced: int
    bytes_synced: int

    @property
    def success_rate(self) -> float:
        return self.n_succeeded / self.n_jobs if self.n_jobs else 0.0

    @property
    def is_problem(self) -> bool:
        return self.latest_status not in (None, "succeeded", "running", "pending")


def summarize_connections(workspace) -> list[ConnectionSyncStatus]:
    """One status row per connection, aggregated over its job history."""
    out: list[ConnectionSyncStatus] = []
    for conn in workspace.list_connections():
        jobs = workspace.list_sync_jobs(connection_id=conn.connection_id)
        out.append(
            ConnectionSyncStatus(
                connection_id=conn.connection_id,
                name=conn.name or "",
                latest_status=jobs[0].get("status") if jobs else None,
                n_jobs=len(jobs),
                n_succeeded=sum(1 for j in jobs if j.get("status") == "succeeded"),
                rows_synced=sum(int(j.get("rowsSynced") or 0) for j in jobs),
                bytes_synced=sum(int(j.get("bytesSynced") or 0) for j in jobs),
            )
        )
    return out


# -- browser state -------------------------------------------------------------


@dataclass
class BrowserState:
    keyword: str | None = None
    connector_type: str | None = None  # "source" | "destination" | None
    min_support: SupportLevel | None = None
    page: int = 1
    extra: dict = field(default_factory=dict)


class InteractiveConsole:
    """Line-oriented REPL over injectable streams (scripted-input
    testable; also works on a live terminal via :func:`main`)."""

    def __init__(
        self,
        *,
        workspace=None,
        in_stream: IO[str] | None = None,
        out_stream: IO[str] | None = None,
        page_size: int = PAGE_SIZE,
    ) -> None:
        self.workspace = workspace
        self.stdin = in_stream or sys.stdin
        self.stdout = out_stream or sys.stdout
        self.page_size = page_size
        self.state = BrowserState()

    # -- plumbing -----------------------------------------------------------

    def _print(self, text: str = "") -> None:
        self.stdout.write(text + "\n")

    def run(self) -> None:
        self._print("pyairbyte-spark interactive — 'help' for commands")
        for line in self.stdin:
            if not self.dispatch(line):
                break
            self.stdout.flush()

    def dispatch(self, line: str) -> bool:
        """One command in; returns False on quit."""
        try:
            parts = shlex.split(line.strip())
        except ValueError as e:
            self._print(f"error: {e}")
            return True
        if not parts:
            return True
        cmd, *args = parts
        handler = getattr(self, f"cmd_{cmd}", None)
        if handler is None:
            self._print(f"unknown command: {cmd} (try 'help')")
            return True
        try:
            return handler(args) is not False
        except Exception as e:  # noqa: BLE001 - console boundary
            self._print(f"error: {type(e).__name__}: {e}")
            return True

    # -- commands -----------------------------------------------------------

    def cmd_help(self, args: list[str]) -> None:
        self._print(__doc__.split("Commands::", 1)[1].strip("\n"))

    def cmd_quit(self, args: list[str]) -> bool:
        self._print("bye")
        return False

    cmd_exit = cmd_quit

    def _filtered_connectors(self):
        from pyairbyte_spark import registry

        names = sorted(registry._get_registry_cache())
        out = []
        for n in names:
            meta = registry.get_connector_metadata(n)
            if self.state.keyword and self.state.keyword.lower() not in n.lower():
                continue
            if self.state.connector_type:
                prefix = f"{self.state.connector_type}-"
                if not n.startswith(prefix):
                    continue
            if self.state.min_support is not None:
                lvl = meta.support_level
                if lvl is None:
                    continue
                try:
                    if SupportLevel.parse(lvl).precedence < self.state.min_support.precedence:
                        continue
                except ValueError:
                    continue
            out.append(meta)
        return out

    def cmd_connectors(self, args: list[str]) -> None:
        if args:
            self.state.keyword = args[0] if args[0] != "*" else None
            self.state.page = 1
        metas = self._filtered_connectors()
        start = (self.state.page - 1) * self.page_size
        page = metas[start : start + self.page_size]
        rows = [
            [
                m.name,
                m.language.value if m.language else "",
                m.support_level or "",
                m.latest_available_version or "",
            ]
            for m in page
        ]
        self._print(_text_table(["name", "language", "support", "version"], rows))
        n_pages = max(1, -(-len(metas) // self.page_size))
        filters = []
        if self.state.keyword:
            filters.append(f"keyword={self.state.keyword}")
        if self.state.connector_type:
            filters.append(f"type={self.state.connector_type}")
        if self.state.min_support:
            filters.append(f"support>={self.state.min_support.value}")
        suffix = f" [{', '.join(filters)}]" if filters else ""
        self._print(
            f"{len(metas)} connectors, page {self.state.page}/{n_pages}{suffix}"
        )

    def cmd_type(self, args: list[str]) -> None:
        if not args:
            raise ValueError("usage: type source|destination|*")
        value = args[0].lower()
        if value in ("*", "any", "all"):
            self.state.connector_type = None
        elif value in ("source", "destination"):
            self.state.connector_type = value
        else:
            raise ValueError("type must be source, destination, or *")
        self.state.page = 1
        self.cmd_connectors([])

    def cmd_support(self, args: list[str]) -> None:
        if not args:
            raise ValueError("usage: support certified|community|archived|*")
        if args[0] in ("*", "any", "all"):
            self.state.min_support = None
        else:
            self.state.min_support = SupportLevel.parse(args[0])
        self.state.page = 1
        self.cmd_connectors([])

    def cmd_page(self, args: list[str]) -> None:
        if not args:
            raise ValueError("usage: page <n>")
        self.state.page = max(1, int(args[0]))
        self.cmd_connectors([])

    def cmd_select(self, args: list[str]) -> None:
        if not args:
            raise ValueError("usage: select <connector-name>")
        from pyairbyte_spark import registry

        meta = registry.get_connector_metadata(args[0])
        self._print(f"── {meta.name} ──")
        self._print(f"language:      {meta.language.value if meta.language else '-'}")
        self._print(f"support level: {meta.support_level or '-'}")
        self._print(f"version:       {meta.latest_available_version or '-'}")
        self._print(
            "install types: "
            + (", ".join(sorted(t.value for t in meta.install_types)) or "-")
        )
        self._print(f"default install: {meta.default_install_type.value}")

    def _require_workspace(self):
        if self.workspace is None:
            raise ValueError(
                "no workspace attached (pass workspace= or set "
                "AIRBYTE_CLOUD_WORKSPACE_ID / AIRBYTE_CLOUD_API_KEY)"
            )
        return self.workspace

    def cmd_history(self, args: list[str]) -> None:
        if not args:
            raise ValueError("usage: history <connection-id> [limit]")
        ws = self._require_workspace()
        limit = int(args[1]) if len(args) > 1 else 20
        jobs = ws.list_sync_jobs(connection_id=args[0], limit=limit)
        rows = [
            [
                j.get("jobId"),
                j.get("jobType", "sync"),
                j.get("status"),
                format_records(int(j.get("rowsSynced") or 0)),
                format_bytes(int(j.get("bytesSynced") or 0)),
            ]
            for j in jobs
        ]
        self._print(_text_table(["job", "type", "status", "records", "bytes"], rows))
        ok = sum(1 for j in jobs if j.get("status") == "succeeded")
        self._print(f"{len(jobs)} jobs, {ok} succeeded")

    def cmd_status(self, args: list[str]) -> None:
        ws = self._require_workspace()
        statuses = summarize_connections(ws)
        rows = [
            [
                s.connection_id,
                s.name,
                s.latest_status or "never run",
                f"{s.success_rate:.0%}",
                format_records(s.rows_synced),
                format_bytes(s.bytes_synced),
                "!" if s.is_problem else "",
            ]
            for s in statuses
        ]
        self._print(
            _text_table(
                ["connection", "name", "latest", "ok%", "records", "bytes", "⚠"],
                rows,
            )
        )
        problems = [s for s in statuses if s.is_problem]
        self._print(
            f"{len(statuses)} connections, {len(problems)} with problems"
            + (
                " (" + ", ".join(p.connection_id for p in problems) + ")"
                if problems
                else ""
            )
        )


def main() -> int:
    """Terminal entry point: build a workspace from env when configured
    (same resolution as the MCP cloud tools), else browse registry-only."""
    from pyairbyte_spark.mcp_server import LocalToolHost

    try:
        ws = LocalToolHost().get_cloud_workspace()
    except Exception:  # noqa: BLE001 - registry-only mode is fine
        ws = None
    InteractiveConsole(workspace=ws).run()
    return 0
