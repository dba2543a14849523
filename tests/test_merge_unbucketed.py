"""r14 data-loss fix: the incremental (touched-buckets) merge carried
entries by narrowing bucket liveness — an UNBUCKETED dir (``buckets:
None``, e.g. from a keyless append onto a key-recorded table) had no
liveness to narrow, fell through the carry loop, and was silently
DROPPED from the manifest. Three-part fix, each gated here:

1. keyless appends onto a key-recorded bucketed table route into the
   bucket layout using the manifest's recorded keys;
2. the incremental gate requires every entry bucketed — a legacy
   unbucketed dir degrades that merge to a full rewrite (correct, and
   the rewrite re-buckets the stray rows, healing the layout);
3. ``_stage`` tolerates the null-bucket partition dir a mixed-layout
   rewrite can produce (bucket None = always-read).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.writers import CommitLogTableStore


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(
        spark, str(tmp_path / "wh"), "main", merge_buckets=8
    )


def _rows(spark, lo, hi, tag="a"):
    return spark.createDataFrame(
        [(i, f"{tag}{i}") for i in range(lo, hi)], "id long, v string"
    )


def _legacy_unbucketed_append(store, df, table):
    """Forge the pre-fix state: an unbucketed dir in a key-recorded
    bucketed table (what a keyless append used to plant)."""
    entry = store._stage(df, table)
    man = store._read_manifest(table, store.latest_version(table))
    store._commit(
        table,
        {
            "op": "append",
            "merge_buckets": man.get("merge_buckets"),
            **(
                {"primary_keys": man["primary_keys"]}
                if man.get("primary_keys")
                else {}
            ),
            "entries": [*man["entries"], {**entry, "buckets": None}],
            **store._carry_mapping(man),
        },
        store.latest_version(table) + 1,
    )


def test_keyless_append_routes_into_buckets(spark, store):
    store.write_append(_rows(spark, 0, 100), "t", ["id"])
    store.write_append(_rows(spark, 500, 505, tag="x"), "t")  # keyless
    man = store._read_manifest("t", store.latest_version("t"))
    assert all(e.get("buckets") for e in man["entries"])
    # and the follow-up merge stays INCREMENTAL (dirs carried by ref)
    v0 = store.latest_version("t")
    store.merge_into(
        "t",
        spark.createDataFrame([(10,)], "id long"),
        ["id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    man1 = store._read_manifest("t", store.latest_version("t"))
    carried = {e["path"] for e in man["entries"]} & {
        e["path"] for e in man1["entries"]
    }
    assert carried, "merge after keyless append lost the incremental path"
    assert store.read("t").filter(F.col("id") >= 500).count() == 5
    assert store.read("t").count() == 104


def test_merge_keeps_unbucketed_rows(spark, store):
    """THE regression: a legacy unbucketed dir + incremental-eligible
    merge used to silently drop the dir's rows."""
    store.write_append(_rows(spark, 0, 50), "t", ["id"])
    _legacy_unbucketed_append(store, _rows(spark, 500, 505, tag="x"), "t")
    store.merge_into(
        "t",
        spark.createDataFrame([(10,)], "id long"),
        ["id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    got = store.read("t")
    assert got.count() == 54
    assert got.filter(F.col("id") >= 500).count() == 5
    # the rewrite HEALED the layout: every entry bucketed again...
    man = store._read_manifest("t", store.latest_version("t"))
    assert all(e.get("buckets") for e in man["entries"])
    # ...so the next merge is incremental AND exact
    store.merge_into(
        "t",
        spark.createDataFrame([(11,)], "id long"),
        ["id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    assert store.read("t").count() == 53


def test_compact_mixed_layout(spark, store):
    """Compacting a table holding a legacy unbucketed dir must not
    crash on the null-bucket partition and must keep every row."""
    store.write_append(_rows(spark, 0, 50), "t", ["id"])
    _legacy_unbucketed_append(store, _rows(spark, 500, 505, tag="x"), "t")
    store.compact("t", sort_by=["id"])
    assert store.read("t").count() == 55
    assert store.read("t").filter(F.col("id") >= 500).count() == 5


def test_keyless_append_missing_key_column_stays_unrouted(spark, store):
    """A keyless append lacking the recorded key column can't be
    bucket-routed — it must still land (unbucketed) and stay readable,
    and merges must keep its rows via the degrade."""
    store.write_append(_rows(spark, 0, 20), "t", ["id"])
    store.write_append(
        spark.createDataFrame(
            [(None, "stray")], "id long, v string"
        ).select(F.col("v"), F.col("id")).drop("id"),
        "t",
    )
    assert store.read("t").count() == 21
    store.merge_into(
        "t",
        spark.createDataFrame([(3,)], "id long"),
        ["id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    cur = store.read("t")
    assert cur.count() == 20
    assert cur.filter(F.col("v") == "stray").count() == 1
