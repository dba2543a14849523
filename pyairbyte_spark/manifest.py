"""Incremental commit manifests: delta encoding + chain resolution.

A commit-log manifest originally carried the table's FULL live-file
list (entries with per-file stats). That makes every commit O(table):
at 10M files the JSON is ~5.8 GB, written per commit — the classic
log-structured-table metadata problem Delta Lake solves with an
action log plus periodic parquet checkpoints.

This module is the store's version of that design, kept deliberately
pure-JSON (no Spark imports) so both the driver-side store
(``writers.py``) and the Python-data-source streaming tail reader
(``sources/commitlog_stream.py``) share one resolver:

- A FULL manifest has an ``entries`` list — it is its own checkpoint.
- A DELTA manifest has ``base`` (always ``version - 1``) plus the
  change actions ``add_entries`` / ``replace_entries`` /
  ``remove_paths``, and carries all small top-level fields
  (op, merge_buckets, primary_keys, column mapping) verbatim.
- Every ``CHECKPOINT_INTERVAL``-th version is forced FULL, bounding
  every resolution chain to < CHECKPOINT_INTERVAL raw reads.

Commit cost becomes O(changed entries); an append to a 10M-file table
writes one entry's worth of JSON, not 5.8 GB. Readers pay ≤ N-1 extra
KB-sized JSON reads, amortized by the store's resolved-manifest cache.
"""

from __future__ import annotations

import json
from typing import Any, Callable

# Every Nth commit is a full snapshot manifest (the chain's
# checkpoint). Tuning: larger = cheaper commits / longer cold reads.
CHECKPOINT_INTERVAL = 20

_DELTA_KEYS = ("base", "add_entries", "replace_entries", "remove_paths")


def is_delta(man: dict[str, Any]) -> bool:
    return "base" in man


def top_fields(man: dict[str, Any]) -> dict[str, Any]:
    """The small top-level fields of a raw commit — everything except
    the entry list / delta actions / sidecar reference. This is what a
    resolved manifest would carry besides ``entries`` (resolution takes
    top fields from the NEWEST commit), and all that scan planning
    needs when the entries themselves are resolved as a Spark job."""
    skip = set(_DELTA_KEYS) | {"entries", "entries_ref", "n_entries"}
    return {k: v for k, v in man.items() if k not in skip}


def diff_entries(
    old_entries: list[dict], new_entries: list[dict]
) -> dict[str, Any] | None:
    """Delta actions turning ``old_entries`` into ``new_entries``, or
    ``None`` when a full manifest is the better (or only correct)
    encoding.

    Only order-preserving transitions are encodable: shared entries
    keep their relative order and new entries are appended — exactly
    what every store write path produces. Anything else (or a change
    touching most entries) falls back to full.
    """
    old = {e["path"]: e for e in old_entries}
    new = {e["path"]: e for e in new_entries}
    if len(old) != len(old_entries) or len(new) != len(new_entries):
        return None  # duplicate paths: refuse to guess
    removed = [p for p in old if p not in new]
    added = [e for e in new_entries if e["path"] not in old]
    # Identity shortcut: write paths carry untouched entries by
    # reference from the resolved base, so `is` skips the deep compare
    # for the common case and the diff costs O(entries), not O(files).
    replaced = {
        p: e
        for p, e in new.items()
        if p in old and e is not old[p] and e != old[p]
    }
    shared_old = [p for p in old if p in new]
    shared_new = [p for p in new if p in old]
    if shared_old != shared_new:
        return None  # reordered: not representable
    if added and [e["path"] for e in new_entries[-len(added):]] != [
        e["path"] for e in added
    ]:
        return None  # additions not appended: not representable
    n_changed = len(removed) + len(added) + len(replaced)
    if n_changed >= max(1, len(new_entries)):
        return None  # full manifest is no bigger — write it instead
    return {
        "remove_paths": removed,
        "add_entries": added,
        "replace_entries": replaced,
    }


def apply_delta(base_entries: list[dict], delta: dict[str, Any]) -> list[dict]:
    out = {e["path"]: e for e in base_entries}
    for p in delta.get("remove_paths") or []:
        out.pop(p, None)
    for p, e in (delta.get("replace_entries") or {}).items():
        out[p] = e  # in-place: replacement keeps the entry's position
    for e in delta.get("add_entries") or []:
        out[e["path"]] = e  # appended
    return list(out.values())


def resolve_manifest(
    read_raw: Callable[[int], dict[str, Any]], version: int
) -> dict[str, Any]:
    """Resolve ``version`` to a FULL manifest, walking the delta chain
    down to its checkpoint (``read_raw(v)`` returns the raw stored
    JSON). Chain length is bounded by ``CHECKPOINT_INTERVAL``."""
    man = read_raw(version)
    if not is_delta(man):
        return man
    chain: list[dict[str, Any]] = []
    cur = man
    while is_delta(cur):
        chain.append(cur)
        cur = read_raw(cur["base"])
    entries = cur.get("entries") or []
    for m in reversed(chain):
        entries = apply_delta(entries, m)
    top = {k: v for k, v in man.items() if k not in _DELTA_KEYS}
    return {**top, "entries": entries}


# -- parquet checkpoints ----------------------------------------------------
# A FULL manifest of a wide table is still big as JSON (~410 B/entry —
# extrapolated ~4 GB at 10M files, paid once per CHECKPOINT_INTERVAL).
# Delta solves this with parquet checkpoint files; same here: when a
# full manifest has ≥ PARQUET_CHECKPOINT_MIN_ENTRIES entries, its entry
# list is written as a columnar parquet SIDECAR (one row per data file,
# dictionary-encoded paths, snappy) and the commit JSON stores only
# {"entries_ref": <sidecar>, "n_entries": N} plus the small top fields.
# The sidecar is written BEFORE the commit JSON (stage-then-publish; an
# orphan sidecar from a lost commit race is garbage vacuum reclaims).

PARQUET_CHECKPOINT_MIN_ENTRIES = 512


def entries_to_parquet_bytes(entries: list[dict]) -> bytes:
    """Serialize an entry list to parquet bytes: one HEADER row per
    entry (file_path NULL, carries path/buckets/has_files) followed by
    one row per file; ``entry_idx`` preserves entry order."""
    import io as _io

    import pyarrow as pa
    import pyarrow.parquet as pq

    cols: dict[str, list] = {
        "entry_idx": [], "entry_path": [], "entry_buckets": [],
        "has_files": [], "file_path": [], "bucket": [], "bytes": [],
        "rows": [], "sv": [], "stats": [], "extra": [],
    }
    # Schema-evolution passthrough: any key outside the typed columns
    # rides in ``extra`` as JSON (header rows carry entry-level
    # extras, file rows file-level), so a field added to the record
    # shape later (as ``sv`` was) survives the sidecar round-trip
    # instead of silently diverging from JSON-stored manifests.
    _ENTRY_KEYS = frozenset(("path", "buckets", "files"))
    _FILE_KEYS = frozenset(("path", "bucket", "bytes", "rows", "stats", "sv"))

    def _row(i, e, f=None):
        cols["entry_idx"].append(i)
        cols["entry_path"].append(e["path"])
        cols["entry_buckets"].append(e.get("buckets"))
        cols["has_files"].append(e.get("files") is not None)
        cols["file_path"].append(None if f is None else f["path"])
        cols["bucket"].append(None if f is None else f.get("bucket"))
        cols["bytes"].append(None if f is None else f.get("bytes"))
        cols["rows"].append(None if f is None else f.get("rows"))
        cols["sv"].append(None if f is None else f.get("sv"))
        cols["stats"].append(
            None if f is None or f.get("stats") is None
            else json.dumps(f["stats"])
        )
        extras = (
            {k: v for k, v in e.items() if k not in _ENTRY_KEYS}
            if f is None
            else {k: v for k, v in f.items() if k not in _FILE_KEYS}
        )
        cols["extra"].append(json.dumps(extras) if extras else None)

    for i, e in enumerate(entries):
        _row(i, e)
        for f in e.get("files") or []:
            _row(i, e, f)
    schema = pa.schema(
        [
            ("entry_idx", pa.int64()),
            ("entry_path", pa.string()),
            ("entry_buckets", pa.list_(pa.int64())),
            ("has_files", pa.bool_()),
            ("file_path", pa.string()),
            ("bucket", pa.int64()),
            ("bytes", pa.int64()),
            ("rows", pa.int64()),
            ("sv", pa.int64()),
            ("stats", pa.string()),
            ("extra", pa.string()),
        ]
    )
    buf = _io.BytesIO()
    pq.write_table(pa.table(cols, schema=schema), buf, compression="snappy")
    return buf.getvalue()


def entries_from_parquet_bytes(data: bytes) -> list[dict]:
    import io as _io

    import pyarrow.parquet as pq

    t = pq.read_table(_io.BytesIO(data))
    rows = t.to_pylist()
    has_extra = "extra" in t.column_names  # pre-round-6 sidecars lack it
    out: dict[int, dict] = {}
    for r in rows:
        i = r["entry_idx"]
        if r["file_path"] is None:  # header row
            out[i] = {
                "path": r["entry_path"],
                "buckets": r["entry_buckets"],
                "files": [] if r["has_files"] else None,
                **(
                    json.loads(r["extra"])
                    if has_extra and r["extra"] is not None
                    else {}
                ),
            }
    for r in rows:
        if r["file_path"] is None:
            continue
        f: dict[str, Any] = {
            "path": r["file_path"],
            "bucket": r["bucket"],
            "bytes": r["bytes"],
        }
        if r["rows"] is not None:
            f["rows"] = r["rows"]
        if r["stats"] is not None:
            f["stats"] = json.loads(r["stats"])
        if r["sv"] is not None:
            f["sv"] = r["sv"]
        if has_extra and r["extra"] is not None:
            f.update(json.loads(r["extra"]))
        out[r["entry_idx"]]["files"].append(f)
    return [out[i] for i in sorted(out)]


def chain_root(read_raw: Callable[[int], dict[str, Any]], version: int) -> int:
    """The version of the FULL manifest that roots ``version``'s chain
    (== ``version`` when it is already full). Nothing at or above the
    root may be deleted while ``version`` must stay resolvable."""
    cur = read_raw(version)
    v = version
    while is_delta(cur):
        v = cur["base"]
        cur = read_raw(v)
    return v
