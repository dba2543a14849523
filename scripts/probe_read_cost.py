#!/usr/bin/env python
"""Driver-side cost of read()-plan construction vs entry count:
append E micro-entries to a store table, then time read(t) (no
action), read(t).dtypes, and read_where on one key.
Usage: python scripts/probe_read_cost.py [entries]"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    from pyairbyte_spark import get_spark
    from pyairbyte_spark.writers import CommitLogTableStore, LocalRows

    e_count = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    spark = get_spark(
        "probe-read", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    store = CommitLogTableStore(spark, tempfile.mkdtemp(prefix="rc-"), "q")
    for i in range(e_count):
        store.write_append(
            LocalRows([(i, f"v{i}")], "id bigint, s string"), "t"
        )
    for label, fn in [
        ("read() construct", lambda: store.read("t")),
        ("read().dtypes", lambda: dict(store.read("t").dtypes)),
        ("read().count()", lambda: store.read("t").count()),
    ]:
        xs = []
        for _ in range(3):
            t0 = time.monotonic()
            fn()
            xs.append(time.monotonic() - t0)
        print(f"E={e_count} {label:18s} {' '.join(f'{x:.3f}' for x in xs)}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
