"""Column / stream name normalization.

Semantics match the reference's ``LowerCaseNormalizer``
(``airbyte/_util/name_normalizers.py:48-87``): lowercase, every
non-alphanumeric run becomes ``_``, a leading digit gets an ``_`` prefix,
and a name that normalizes to nothing (or only underscores) is an error.
Applied to top-level column names and stream/table names only — nested
keys are untouched (``airbyte/records.py:9-36``).
"""

from __future__ import annotations

import functools
import re


class NameNormalizationError(ValueError):
    """Raised when a name normalizes to an empty/invalid identifier."""


class NameNormalizerBase:
    """Extension point mirroring the reference's normalizer protocol."""

    @staticmethod
    def normalize(name: str) -> str:
        raise NotImplementedError

    @classmethod
    def normalize_set(cls, names: list[str]) -> list[str]:
        return [cls.normalize(n) for n in names]


class LowerCaseNormalizer(NameNormalizerBase):
    @staticmethod
    @functools.cache
    def normalize(name: str) -> str:
        result = re.sub(r"[^A-Za-z0-9]", "_", str(name).lower())
        if result and result[0].isdigit():
            result = "_" + result
        if not result.replace("_", ""):
            raise NameNormalizationError(
                f"Name {name!r} normalizes to an invalid identifier {result!r}"
            )
        return result


class CaseInsensitiveNormalizer(NameNormalizerBase):
    """Identity-but-lowercase normalizer (for case-insensitive matching)."""

    @staticmethod
    def normalize(name: str) -> str:
        return str(name).lower()


def normalize_records_keys(record: dict, *, keys: list[str] | None = None) -> dict:
    """Normalize top-level keys of a record dict (nested keys untouched)."""
    norm = LowerCaseNormalizer.normalize
    if keys is None:
        return {norm(k): v for k, v in record.items()}
    wanted = {norm(k) for k in keys}
    return {norm(k): v for k, v in record.items() if norm(k) in wanted}
