"""Per-file bloom filters: point-lookup data skipping beyond zone maps.

Min/max zone maps prune RANGE predicates but are useless for equality
lookups on high-cardinality unsorted columns (the "find this uuid in
100 TB" shape: every file's [min, max] spans the whole domain). The
standard lakehouse answer is a per-file bloom filter on the lookup
columns — Delta's bloom filter index, parquet's column bloom filters —
re-expressed for the commit-log store:

- :meth:`CommitLogTableStore.build_bloom_index` scans the table ONCE
  (``_metadata.file_path`` groups rows by file; one Arrow-batched
  bitset fold per file) and writes a ``bloomidx-<hex>/`` parquet of
  (entry_path, file_path, col, m, k, bits). The manifest's
  ``bloom_index`` field references it; every commit carries the field
  forward.
- ``plan_scan`` / ``read_where`` test ``=`` / ``in`` predicates
  against the bits: a definite miss prunes the file. Files without
  bloom rows (appended after the build) are conservatively kept —
  re-run the build with ``only_missing=True`` on the maintenance
  cadence to cover them incrementally.

Bits are sized from the file's recorded row count for the target
false-positive rate (``m = -n ln p / ln2²`` ≈ 9.6 bits/key at 1%);
membership uses Kirsch–Mitzenmacher double hashing over the same
md5-of-string-cast hash both the build (Spark) and the probe (driver
Python) compute, so build/probe agree exactly. Indexed columns are
restricted to string/integral types — the one family whose Spark
``CAST(x AS STRING)`` rendering equals Python ``str(x)``, which is
what lets the driver hash a predicate literal without a Spark job.

Skipping is an OPTIMIZATION with an exactness contract: results with
and without the index are identical (the residual row filter runs
either way); the oracle query ``store_bloom_skipping_events`` pins it.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

# Cap bits per (file, column) so a pathological row count cannot
# inflate the index: 2^23 bits = 1 MiB covers ~870k keys at 1% fpr,
# which is already far above a well-sized file's row count.
MAX_BITS = 1 << 23
MIN_BITS = 64


def size_bits(n_rows: int, fpr: float) -> tuple[int, int]:
    """(m bits, k hashes) for ``n_rows`` keys at the target fpr."""
    n = max(1, int(n_rows))
    m = int(-n * math.log(fpr) / (math.log(2) ** 2))
    m = max(MIN_BITS, min(MAX_BITS, m))
    k = max(1, round(m / n * math.log(2)))
    return m, min(16, k)


def _h1_h2(value: str) -> tuple[int, int]:
    """Two independent 60-bit hashes from one md5 (the same
    md5-of-string family every sketch in this repo uses)."""
    hexd = hashlib.md5(value.encode("utf-8")).hexdigest()
    return int(hexd[:15], 16), int(hexd[15:30], 16) | 1


def positions(value: str, m: int, k: int) -> list[int]:
    """Kirsch–Mitzenmacher: g_i = h1 + i*h2 mod m."""
    h1, h2 = _h1_h2(value)
    return [(h1 + i * h2) % m for i in range(k)]


def build_bits(values, m: int, k: int) -> bytes:
    """Bitset bytes for an iterable of (already stringified) keys.
    The md5 per key is the unavoidable Python cost; the k probe
    positions set vectorized (k numpy scatters over the whole batch),
    so build time is hash-bound, not loop-bound."""
    pairs = [_h1_h2(v) for v in values if v is not None]
    bits = np.zeros(m, dtype=bool)
    if pairs:
        # Reduce mod m FIRST (identical residues, no uint64 overflow:
        # h2 % m < 2^23 so i*(h2%m) stays tiny) — bit-identical to the
        # scalar positions() the probe side computes.
        arr = np.asarray(pairs, dtype=np.uint64) % np.uint64(m)
        h1, h2 = arr[:, 0], arr[:, 1]
        for i in range(k):
            bits[
                ((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64)
            ] = True
    return np.packbits(bits).tobytes()


def build_bits_from_lanes(h1_arr, h2_arr, m: int, k: int) -> bytes:
    """Bitset bytes from PRE-COMPUTED hash lanes (int64 arrays; -1
    marks a NULL key). The distributed build computes the two md5
    lanes as JVM expressions — ``conv(substring(md5(cast(x as
    string)), 1, 15), 16, 10)`` and ``… (16, 15) … | 1`` — so Python
    never hashes a key; this fold is k vectorized scatters.
    Bit-identical to :func:`build_bits` / :func:`positions` by the same
    reduce-mod-m-first argument (h1, h2 < 2^60; residues < m ≤ 2^23,
    so i·(h2 % m) never overflows uint64)."""
    bits = np.zeros(m, dtype=bool)
    mask = h1_arr >= 0
    if mask.any():
        h1 = h1_arr[mask].astype(np.uint64) % np.uint64(m)
        h2 = h2_arr[mask].astype(np.uint64) % np.uint64(m)
        for i in range(k):
            bits[
                ((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64)
            ] = True
    return np.packbits(bits).tobytes()


def maybe_contains(bits: bytes, m: int, k: int, value: str) -> bool:
    arr = np.unpackbits(np.frombuffer(bits, dtype=np.uint8), count=m)
    return all(arr[pos] for pos in positions(value, m, k))


def branch_may_match(
    file_blooms: dict, branch: list[tuple], m_k_bits=None
) -> bool:
    """Whether one AND-branch of a DNF may match a file, judged ONLY
    by its bloom-indexed equality conjuncts (everything else is
    someone else's problem — zone maps, residual filters). A definite
    bloom miss on any conjunct rules the branch out.

    ``file_blooms`` maps physical column -> (m, k, bits).
    """
    for conj in branch:
        col, op, *rest = conj
        fb = file_blooms.get(col)
        if fb is None:
            continue
        m, k, bits = fb
        if op in ("=", "=="):
            r = _render(rest[0])
            if r is not None and not maybe_contains(bits, m, k, r):
                return False
        elif op == "in":
            vals = [_render(v) for v in rest[0]]
            vals = [v for v in vals if v is not None]
            if vals and not any(
                maybe_contains(bits, m, k, v) for v in vals
            ):
                return False
    return True


def dnf_may_match(file_blooms: dict, preds: list[list[tuple]]) -> bool:
    """OR over the DNF's branches; empty DNF = no predicate = match."""
    if not preds:
        return True
    return any(branch_may_match(file_blooms, b) for b in preds)


def _render(value) -> str | None:
    """Python rendering of a predicate literal, matching Spark's
    CAST(x AS STRING) for the supported (string/integral) key types.
    Anything else (None, floats, bools…) returns None — the caller
    treats the conjunct as maybe-true and leaves its semantics to the
    residual filter: skipping may only ever be CONSERVATIVE."""
    if isinstance(value, str):
        return value
    if isinstance(value, bool):  # bool is an int subclass — skip it
        return None
    if isinstance(value, int):
        return str(value)
    return None


SUPPORTED_TYPE_PREFIXES = ("string", "varchar", "char", "int", "bigint",
                           "smallint", "tinyint", "long")


def type_supported(simple_type: str) -> bool:
    return simple_type.lower().startswith(SUPPORTED_TYPE_PREFIXES)
