#!/usr/bin/env python
"""Full oracle sweep at an arbitrary scale factor.

The driver's correctness gate runs at sf0.01; scale-dependent bugs
(e.g. anything keyed to block/partition counts) can hide there. This
sweeps EVERY registered query against its DuckDB oracle at the given
sf dir (default sf0.1) and exits non-zero on any mismatch.

Usage: python scripts/oracle_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyairbyte_spark import get_spark
from pyairbyte_spark.queries import oracle_sql, queries

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("oracle-sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad: list[tuple[str, str]] = []
    for name, sql in sorted(oracle_sql().items()):
        try:
            oracle = con.execute(sql).fetchdf()
            got = queries()[name](spark, sf_dir).toPandas()
            cols = sorted(got.columns)
            if sorted(oracle.columns) != cols:
                bad.append((name, f"schema: {sorted(oracle.columns)} != {cols}"))
                continue
            key = lambda d: sorted(  # noqa: E731
                map(tuple, d[cols].astype(str).itertuples(index=False))
            )
            if key(got) != key(oracle):
                bad.append((name, f"values ({len(got)} vs {len(oracle)} rows)"))
            else:
                print(f"ok   {name} ({len(got)} rows)")
        except Exception as exc:  # noqa: BLE001
            bad.append((name, f"error: {exc}"))
    for name, why in bad:
        print(f"FAIL {name}: {why}")
    print(f"{len(oracle_sql()) - len(bad)}/{len(oracle_sql())} queries match at {sf_dir}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
