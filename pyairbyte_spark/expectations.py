"""Write-time data expectations (CHECK-constraint enforcement).

Delta Lake enforces ``CHECK`` constraints and ``NOT NULL`` during the
write transaction; warehouses do it in the table DDL. The reference
delegates constraint behavior to the destination warehouse (its SQL
processors create plain typed tables — ``airbyte/shared/
sql_processor.py:913-933`` — and rely on dest-side failures). Building
on parquet, enforcement has to live in the write path, so the cache
exposes it directly.

Semantics follow SQL ``CHECK``: a row violates a check only when the
expression evaluates to **FALSE** — a NULL result passes (write the
null-check explicitly: ``"id IS NOT NULL"``). Violation handling:

- ``fail``: one aggregate job counts violations per check; any hit
  raises :class:`ExpectationViolation` with the counts and nothing is
  written. This reads the input before writing it — the price of
  all-or-nothing semantics without a transactional sink (with the
  commit-log store the staged-but-uncommitted dir would be the
  cheaper seam, but `fail` must also protect the plain parquet store).
- ``drop``: violating rows are filtered out; per-check violation
  counts are collected via ``df.observe`` DURING the write — zero
  extra jobs, exact counts (the curation-pipeline mode).
- ``quarantine``: like ``drop``, but the violating rows are returned
  for the caller to land in a side table (reverse-ETL rejects
  pattern).

At 100 TB: ``drop`` adds no scan (observe piggybacks on the write),
``fail``/``quarantine`` add exactly one extra pass over the input.
All checks evaluate in a single projection — JVM expressions, no
Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyairbyte_spark.exceptions import PyAirbyteInputError


class ExpectationViolation(PyAirbyteInputError):
    """Raised in ``fail`` mode when any check has violations."""

    def __init__(self, counts: dict[str, int]) -> None:
        self.counts = {k: v for k, v in counts.items() if v}
        super().__init__(
            message="data expectations violated",
            context={"violations": self.counts},
        )


def _violation_col(check: str | Column) -> Column:
    expr = F.expr(check) if isinstance(check, str) else check
    # SQL CHECK: only FALSE violates; NULL passes.
    return expr.eqNullSafe(F.lit(False))


def violation_counts(df: DataFrame, checks: dict[str, str | Column]) -> dict[str, int]:
    """One aggregate job: per-check violation counts."""
    if not checks:
        return {}
    aggs = [
        F.sum(_violation_col(c).cast("long")).alias(name)
        for name, c in checks.items()
    ]
    row = df.agg(*aggs).collect()[0]
    return {name: int(row[name] or 0) for name in checks}


def check_expectations(
    df: DataFrame,
    checks: dict[str, str | Column],
    *,
    on_violation: str = "fail",
) -> tuple[DataFrame, DataFrame | None, "ExpectationObservation | None"]:
    """Apply ``checks`` to ``df`` per ``on_violation`` mode.

    Returns ``(clean_df, quarantined_df, observation)``:

    - ``fail``: raises :class:`ExpectationViolation` on any violation,
      else returns the input unchanged (already fully validated).
    - ``drop``: ``clean_df`` filters violators; ``observation.counts``
      becomes available after an action runs on ``clean_df``.
    - ``quarantine``: additionally returns the violating rows with a
      ``_failed_expectations`` array column naming the failed checks.
    """
    if on_violation not in ("fail", "drop", "quarantine"):
        raise PyAirbyteInputError(
            message="on_violation must be one of fail/drop/quarantine",
            context={"on_violation": on_violation},
        )
    if not checks:
        return df, None, None
    if on_violation == "fail":
        counts = violation_counts(df, checks)
        if any(counts.values()):
            raise ExpectationViolation(counts)
        return df, None, None

    any_violation = None
    for name, c in checks.items():
        v = _violation_col(c)
        any_violation = v if any_violation is None else (any_violation | v)

    if on_violation == "quarantine":
        failed = F.filter(
            F.array(
                *[
                    F.when(_violation_col(c), F.lit(name))
                    for name, c in checks.items()
                ]
            ),
            lambda x: x.isNotNull(),
        )
        # Counts ride the QUARANTINE write via observe (violating rows
        # all pass through that branch) — no separate counting job.
        obs = ExpectationObservation(checks)
        quarantined = (
            df.observe(
                obs.observation,
                *[
                    F.sum(_violation_col(c).cast("long")).alias(name)
                    for name, c in checks.items()
                ],
            )
            .filter(any_violation)
            .withColumn("_failed_expectations", failed)
        )
        return df.filter(~any_violation), quarantined, obs

    # drop: free exact counts via observe — they materialize with the
    # write action itself, no separate job.
    obs = ExpectationObservation(checks)
    observed = df.observe(
        obs.observation,
        *[
            F.sum(_violation_col(c).cast("long")).alias(name)
            for name, c in checks.items()
        ],
    )
    return observed.filter(~any_violation), None, obs


class ExpectationObservation:
    """Handle to the observe() metrics of a ``drop``-mode write."""

    def __init__(self, checks: dict) -> None:
        from pyspark.sql import Observation

        self.observation = Observation()
        self._names = list(checks)

    @property
    def counts(self) -> dict[str, int]:
        got = self.observation.get
        return {n: int(got.get(n) or 0) for n in self._names}
