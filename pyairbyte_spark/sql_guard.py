"""Guarded SQL passthrough.

Parity with the reference's MCP ``run_sql_query`` gate
(``airbyte/mcp/local.py:753-846``): a single statement, read-only —
SELECT / DESCRIBE / SHOW / EXPLAIN / WITH...SELECT only.

Validation runs on a *scrubbed* copy (comments removed, string
literals blanked, quote-aware — a ``--`` or ``;`` inside a literal is
data, not syntax) but the ORIGINAL text is what executes: the guard
never rewrites the query it approves.
"""

from __future__ import annotations

import re

_ALLOWED_PREFIXES = ("select", "describe", "show", "explain", "with", "values")
_FORBIDDEN = re.compile(
    r"\b(insert|update|delete|merge|drop|alter|create|truncate|grant|revoke|"
    r"vacuum|copy|attach|detach|set|call|refresh)\b",
    re.IGNORECASE,
)
# Read-only statements whose own syntax contains a forbidden word.
_BENIGN_PHRASES = (re.compile(r"^show\s+create\s+table\b", re.IGNORECASE),)


class UnsafeSQLError(ValueError):
    pass


def _scrub(sql: str) -> str:
    """Comments removed; '…' / "…" / `…` literals blanked to empty
    quotes. Quote-aware: comment markers inside literals survive as
    data (and are blanked with the literal), literal bodies never reach
    the verb scan."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c in ("'", '"', "`"):
            j = i + 1
            while j < n:
                if sql[j] == "\\" and j + 1 < n:
                    j += 2
                    continue
                if sql[j] == c:
                    if c == "'" and j + 1 < n and sql[j + 1] == "'":
                        j += 2  # '' escape
                        continue
                    break
                j += 1
            out.append(c + c)
            i = j + 1
        elif sql.startswith("--", i):
            nl = sql.find("\n", i)
            out.append(" ")
            i = n if nl == -1 else nl
        elif sql.startswith("/*", i):
            end = sql.find("*/", i + 2)
            out.append(" ")
            i = n if end == -1 else end + 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def strip_comments(sql: str) -> str:
    """Back-compat shim: the scrubbed text (comments gone, literals
    blanked). For display/validation only — never execute this; the
    blanking changes literal values."""
    return _scrub(sql).strip()


def is_safe_sql(sql: str) -> bool:
    body = _scrub(sql).strip().rstrip("; \t\r\n")
    if not body or ";" in body:  # single statement only
        return False
    if not body.lower().startswith(_ALLOWED_PREFIXES):
        return False
    # Uniform forbidden-verb scan — EXPLAIN/DESCRIBE/SHOW bodies
    # included (EXPLAIN <write> is rejected, not analyzed). Benign
    # fixed phrases (SHOW CREATE TABLE) are excised first.
    for phrase in _BENIGN_PHRASES:
        body = phrase.sub("show", body)
    return not _FORBIDDEN.search(body)


def guard_sql(sql: str) -> str:
    if not is_safe_sql(sql):
        raise UnsafeSQLError(
            "Only single-statement SELECT / DESCRIBE / SHOW / EXPLAIN queries are allowed"
        )
    # Execute the ORIGINAL text (trailing semicolons/space trimmed —
    # a trailing literal always ends in a quote, so this only ever
    # removes statement terminators), not the scrubbed copy.
    return sql.strip().rstrip("; \t\r\n")
