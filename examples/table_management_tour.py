#!/usr/bin/env python
"""Round-5 table-management tour: the commit-log store's governance
surface end to end — constraints, concurrent writers, rollback,
maintenance, and the storage seam.

Run: python examples/table_management_tour.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from pyairbyte_spark import get_spark
from pyairbyte_spark.expectations import ExpectationViolation
from pyairbyte_spark.fileio import FakeObjectStoreFileIO
from pyairbyte_spark.writers import CommitLogTableStore


def _df(spark, rows, prefix="r"):
    df = spark.createDataFrame(rows, ["id", "v"])
    return df.withColumn(
        "_airbyte_raw_id", F.concat(F.lit(prefix), F.col("id").cast("string"))
    ).withColumn("_airbyte_extracted_at", F.current_timestamp())


def main() -> None:
    spark = get_spark("table-tour")
    # Object-store-semantics FileIO: the same store protocol that runs
    # on S3-class storage (conditional PUT, no renames).
    store = CommitLogTableStore(
        spark,
        tempfile.mkdtemp("tour"),
        "main",
        merge_buckets=4,
        fileio=FakeObjectStoreFileIO(),
    )

    store.write_merge(
        _df(spark, [(i, f"v{i}") for i in range(1, 11)]), "t", ["id"]
    )
    print("v1 rows:", store.read("t").count())

    # Persisted CHECK: validated against existing rows, then enforced
    # inside every later write — including UPDATE rewrites.
    store.set_check("t", "id_positive", "id > 0")
    try:
        store.update_where("t", [("id", "=", 3)], {"v": "'x'", "id": None})
    except ValueError as e:
        print("pk guard:", e)
    try:
        store.write_append(_df(spark, [(-1, "bad")], "z"), "t")
    except ExpectationViolation as e:
        print("check blocked append:", e.counts)

    # DML + change feed
    store.delete_where("t", [("id", ">=", 8)])
    store.update_where("t", [("id", "<", 3)], {"v": F.lit("HOT")})
    feed = store.read_changes("t", 2)
    print(
        "changes since set_check:",
        sorted(
            (r["_change_type"], r["id"])
            for r in feed.select("_change_type", "id").collect()
        ),
    )

    # Rollback: RESTORE is a forward commit — auditable, reversible.
    restored = store.restore("t", 2)
    print("restored to v2 as v%d; rows:" % restored, store.read("t").count())

    # Maintenance: cluster + reclaim. History shows everything.
    store.compact("t", sort_by=["id"])
    store.vacuum("t", keep_commits=3)
    for h in store.history("t"):
        print(
            f'  v{h["version"]:>2} {h.get("op"):>8}'
            + (f' (restored {h["restored_version"]})' if h.get("restored_version") else "")
        )
    plan = store.plan_scan("t", [("id", "<", 3)])
    print("pruned scan:", plan["files_selected"], "of", plan["files_total"], "files")


if __name__ == "__main__":
    main()
