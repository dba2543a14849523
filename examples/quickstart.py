#!/usr/bin/env python
"""Quickstart: sync a source into the cache and query it.

Run: python examples/quickstart.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyairbyte_spark import SparkCache, get_spark
from pyairbyte_spark.sources import SourceFaker


def main() -> None:
    spark = get_spark("quickstart")
    cache = SparkCache(spark, tempfile.mkdtemp("warehouse"))
    result = SourceFaker(seed=1234, count=200).read(cache, write_strategy="auto")
    print("synced:", result.record_counts)

    users = cache["users"].with_filter("age > 40")
    print("users over 40:", len(users))
    print(cache.run_sql_query("SELECT count(*) AS n FROM purchases"))
    print("throughput:", round(result.progress.records_per_second), "rec/s")
    spark.stop()


if __name__ == "__main__":
    main()
