"""Guarded SQL passthrough.

Parity with the reference's MCP ``run_sql_query`` gate
(``airbyte/mcp/local.py:753-846``): a single statement, read-only —
SELECT / DESCRIBE / SHOW / EXPLAIN / WITH...SELECT only.
"""

from __future__ import annotations

import re

_ALLOWED_PREFIXES = ("select", "describe", "show", "explain", "with", "values")
_FORBIDDEN = re.compile(
    r"\b(insert|update|delete|merge|drop|alter|create|truncate|grant|revoke|"
    r"vacuum|copy|attach|detach|set|call|refresh)\b",
    re.IGNORECASE,
)


class UnsafeSQLError(ValueError):
    pass


def strip_comments(sql: str) -> str:
    sql = re.sub(r"--[^\n]*", " ", sql)
    sql = re.sub(r"/\*.*?\*/", " ", sql, flags=re.DOTALL)
    return sql.strip()


def is_safe_sql(sql: str) -> bool:
    body = strip_comments(sql).rstrip(";").strip()
    if not body or ";" in body:  # single statement only
        return False
    if not body.lower().startswith(_ALLOWED_PREFIXES):
        return False
    if body.lower().startswith("with"):
        # CTEs may contain only reads; forbidden verbs anywhere reject.
        return not _FORBIDDEN.search(body)
    first_word = body.split(None, 1)[0].lower()
    if first_word in ("select", "values", "describe", "show", "explain"):
        return not _FORBIDDEN.search(body) or first_word in ("describe", "show", "explain")
    return False


def guard_sql(sql: str) -> str:
    if not is_safe_sql(sql):
        raise UnsafeSQLError(
            "Only single-statement SELECT / DESCRIBE / SHOW / EXPLAIN queries are allowed"
        )
    return strip_comments(sql).rstrip(";").strip()
