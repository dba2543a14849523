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

from typing import Any, Callable

# Every Nth commit is a full snapshot manifest (the chain's
# checkpoint). Tuning: larger = cheaper commits / longer cold reads.
CHECKPOINT_INTERVAL = 20

_DELTA_KEYS = ("base", "add_entries", "replace_entries", "remove_paths")


def is_delta(man: dict[str, Any]) -> bool:
    return "base" in man


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
