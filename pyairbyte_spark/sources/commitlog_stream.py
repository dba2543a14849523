"""Commit-log tables as a native Structured Streaming source.

    from pyairbyte_spark.sources.commitlog_stream import register
    register(spark)
    stream = (spark.readStream.format("commitlog_feed")
              .option("path", "/warehouse/main/events").load())

Spark's offset IS the commit version: each micro-batch emits the rows
appended by commits (start, latest], stamped with ``_commit_version``.
Checkpointing, replay and exactly-once-per-batch bookkeeping come from
Structured Streaming's offset log; the commit log itself is the
write-ahead log, so there is nothing else to coordinate — the same
"engine-native offset" design as the Airbyte-protocol stream reader
(``datasource.py``), with commit versions instead of state artifacts.

Scope: APPEND-ONLY tables (event/fact streams — the tail-consumption
case). The reader walks manifests (pure JSON) and reads only the
NEWLY-STAGED files of append commits via pyarrow; compact commits move
bytes, not rows, and are skipped. Merge/replace tables have no
well-defined row tail (their commits rewrite history) — the reader
fails loudly and points at :class:`~pyairbyte_spark.streaming.feed.
ChangeFeedFollower`, which computes real CDC diffs per window.

Scale: a SimpleDataSourceStreamReader reads on the driver — right for
a tail whose per-batch volume is one sync's appends, wrong for a
100 TB backfill. Bootstrap big history with a batch read of the
snapshot, then stream from the current version
(``option("start_version", N)``).
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

BUCKET_COL = "__pk_bucket"
COMMIT_DIR = "_commits"
VERSION_COL = "_commit_version"


# -- manifest access (pure JSON; no SparkSession) ----------------------------


def _commits_dir(table_path: str) -> str:
    return os.path.join(table_path, COMMIT_DIR)


def _versions(table_path: str) -> list[int]:
    try:
        names = os.listdir(_commits_dir(table_path))
    except OSError:
        return []
    return sorted(int(n[:-5]) for n in names if n.endswith(".json"))


def _txn_verdict(table_path: str, group_id: str) -> str | None:
    """Decision of a multi-table txn group ("commit"/"abort"/None =
    undecided). The decision file lives beside the TABLES, at the
    store root (the table dir's parent) — pure JSON, like the rest of
    this reader."""
    root = os.path.dirname(os.path.normpath(table_path))
    p = os.path.join(root, "_txngroups", f"{group_id}.json")
    try:
        with open(p) as f:
            return json.load(f)["verdict"]
    except OSError:
        return None


def _txn_state(table_path: str, man: dict) -> str:
    """"visible" / "aborted" / "undecided" for one commit's raw JSON."""
    gid = man.get("txn_group")
    if gid is None:
        return "visible"
    v = _txn_verdict(table_path, gid)
    if v == "commit":
        return "visible"
    return "aborted" if v == "abort" else "undecided"


def _manifest_raw(table_path: str, version: int) -> dict:
    p = os.path.join(_commits_dir(table_path), f"{version:020d}.json")
    with open(p) as f:
        man = json.load(f)
    ref = man.get("entries_ref")
    if ref is not None:  # parquet checkpoint sidecar
        from pyairbyte_spark.manifest import entries_from_parquet_bytes

        with open(os.path.join(_commits_dir(table_path), ref), "rb") as f:
            man = {**man, "entries": entries_from_parquet_bytes(f.read())}
    return man


def _manifest(table_path: str, version: int) -> dict:
    """Resolved (full-entries) manifest — commits may be stored as
    deltas (``pyairbyte_spark.manifest``); the resolver is pure JSON,
    safe inside the Python data-source worker."""
    from pyairbyte_spark.manifest import resolve_manifest

    return resolve_manifest(lambda v: _manifest_raw(table_path, v), version)


def _entry_paths(man: dict) -> set[str]:
    return {e["path"] for e in man.get("entries") or []}


def _new_entries(table_path: str, version: int) -> list[dict]:
    """The entries STAGED by commit ``version``. Delta-stored commits
    declare them directly (``add_entries`` — O(changed), no prior
    resolution); full manifests are diffed against the predecessor."""
    raw = _manifest_raw(table_path, version)
    if "base" in raw:
        return raw.get("add_entries") or []
    man = raw
    prev_paths: set[str] = set()
    if version > 1:
        prev_paths = _entry_paths(_manifest(table_path, version - 1))
    return [e for e in man.get("entries") or [] if e["path"] not in prev_paths]


def _new_files(table_path: str, version: int) -> list[str]:
    """Absolute paths of the files STAGED by an append commit."""
    out: list[str] = []
    for e in _new_entries(table_path, version):
        base = os.path.join(table_path, e["path"])
        files = e.get("files")
        if files is not None:
            out.extend(os.path.join(base, f["path"]) for f in files)
        else:  # pre-stats manifest: walk the staged dir
            for dirpath, _, names in os.walk(base):
                out.extend(
                    os.path.join(dirpath, n)
                    for n in sorted(names)
                    if n.endswith(".parquet")
                )
    return out


# metadata-only commit ops: no rows to stream, safely skipped
_METADATA_OPS = (
    "compact",
    "rename_column",
    "drop_column",
    "set_check",
    "add_column",
    "repair_metadata",
    "set_bloom_index",
)


class CommitLogTailReader(SimpleDataSourceStreamReader):
    def __init__(self, schema, options: dict[str, str]) -> None:
        self.table_path = options.get("path")
        if not self.table_path:
            raise ValueError("option 'path' (commit-log table directory) is required")
        self.start_version = int(options.get("start_version", 0))
        # Rate limiting (Delta's maxFilesPerTrigger): cap how much of
        # the pending tail one micro-batch replays; the remainder
        # arrives in later triggers. A single commit is never split —
        # at least one data commit always proceeds.
        self.max_files = int(options.get("max_files_per_trigger", 0)) or None
        self.max_commits = (
            int(options.get("max_commits_per_trigger", 0)) or None
        )
        # schema minus the version stamp = the columns read from files
        self.field_names = [n for n in schema.fieldNames() if n != VERSION_COL]
        self.emit_version = VERSION_COL in schema.fieldNames()
        # Column mapping: schema fields are LOGICAL names (as of stream
        # start); files always carry the stable PHYSICAL names, so one
        # logical→physical map read once serves every commit, before
        # and after any rename boundary the stream crosses.
        vs = _versions(self.table_path)
        mapping = (
            _manifest(self.table_path, vs[-1]).get("column_mapping") or {}
            if vs
            else {}
        )
        self._phys = {logical: phys for phys, logical in mapping.items()}

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def _rows_between(self, after: int, upto: int) -> list[tuple]:
        import pyarrow.parquet as pq

        rows: list[tuple] = []
        for v in range(after + 1, upto + 1):
            raw = _manifest_raw(self.table_path, v)
            state = _txn_state(self.table_path, raw)
            if state == "aborted":
                continue  # txn-group prepare that never became visible
            if state == "undecided":
                # read() caps the frontier BEFORE the first undecided
                # prepare, so this only fires on a hand-built offset.
                raise ValueError(
                    f"commit {v} of {self.table_path!r} is an undecided "
                    "multi-table-txn prepare; offsets must not cross it"
                )
            op = raw.get("op")
            if op in _METADATA_OPS:
                continue  # bytes or metadata moved, no new rows
            if op != "append":
                raise ValueError(
                    f"commitlog_feed streams append-only tables; commit "
                    f"{v} of {self.table_path!r} is op={op!r}. Use "
                    "ChangeFeedFollower for merge/replace tables."
                )
            for path in _new_files(self.table_path, v):
                tbl = pq.read_table(path)
                cols = {}
                for name in self.field_names:
                    phys = self._phys.get(name, name)
                    if phys in tbl.column_names:
                        cols[name] = tbl.column(phys).to_pylist()
                    else:  # schema evolution: older file lacks the column
                        cols[name] = [None] * tbl.num_rows
                for i in range(tbl.num_rows):
                    row = tuple(cols[name][i] for name in self.field_names)
                    rows.append(row + (v,) if self.emit_version else row)
        return rows

    def _cap_batch(self, after: int, latest: int) -> int:
        """Largest version ≤ latest the next batch may include under
        the per-trigger caps (commit granularity; ≥1 data commit)."""
        if not self.max_files and not self.max_commits:
            return latest
        upto = after
        files = commits = 0
        for v in range(after + 1, latest + 1):
            raw = _manifest_raw(self.table_path, v)
            is_data = (
                raw.get("op") == "append"
                and _txn_state(self.table_path, raw) == "visible"
            )
            f = len(_new_files(self.table_path, v)) if is_data else 0
            c = 1 if is_data else 0
            if upto > after and (
                (self.max_commits and commits + c > self.max_commits)
                or (self.max_files and files + f > self.max_files)
            ):
                break
            upto = v
            files += f
            commits += c
        return upto

    def read(self, start: dict):
        vs = _versions(self.table_path)
        latest = vs[-1] if vs else start["version"]
        # The offset frontier must stop BEFORE the first UNDECIDED
        # txn-group prepare: if it later commits, an offset already
        # past it would silently drop its rows. (Aborted prepares are
        # consumed-and-skipped like metadata commits; undecided ones
        # exist only at the head — writers resolve before landing
        # above — so this costs one header read per pending commit.)
        frontier = start["version"]
        for v in range(start["version"] + 1, latest + 1):
            if (
                _txn_state(self.table_path, _manifest_raw(self.table_path, v))
                == "undecided"
            ):
                break
            frontier = v
        latest = frontier
        if latest <= start["version"]:
            return iter([]), start
        upto = self._cap_batch(start["version"], latest)
        return iter(self._rows_between(start["version"], upto)), {
            "version": upto
        }

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows_between(start["version"], end["version"]))

    def commit(self, end: dict) -> None:
        pass


class CommitLogFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "commitlog_feed"

    def schema(self):
        """Infer from the newest live file's parquet footer (driver-side
        metadata read), plus the ``_commit_version`` stamp."""
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import LongType, StructField, StructType

        table_path = self.options.get("path")
        if not table_path:
            raise ValueError("option 'path' (commit-log table directory) is required")
        vs = _versions(table_path)
        if not vs:
            raise ValueError(f"no commit log at {table_path!r}")
        man = _manifest(table_path, vs[-1])
        entries = man.get("entries") or []
        if not entries:
            raise ValueError(f"table at {table_path!r} is empty")
        e = entries[-1]
        files = e.get("files")
        if files:
            first = os.path.join(table_path, e["path"], files[0]["path"])
        else:
            base = os.path.join(table_path, e["path"])
            first = next(
                os.path.join(dp, n)
                for dp, _, ns in os.walk(base)
                for n in sorted(ns)
                if n.endswith(".parquet")
            )
        arrow = pq.read_schema(first)
        base_schema = from_arrow_schema(arrow)
        # footers carry PHYSICAL names; expose the LOGICAL view
        mapping = man.get("column_mapping") or {}
        dropped = set(man.get("dropped_columns") or [])
        fields: list[Any] = []
        for f in base_schema.fields:
            if f.name == BUCKET_COL or f.name in dropped:
                continue
            logical = mapping.get(f.name, f.name)
            fields.append(StructField(logical, f.dataType, f.nullable))
        fields.append(StructField(VERSION_COL, LongType(), False))
        return StructType(fields)

    def simpleStreamReader(self, schema) -> CommitLogTailReader:
        return CommitLogTailReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(CommitLogFeedDataSource)
