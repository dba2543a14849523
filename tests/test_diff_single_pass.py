"""Equivalence gate for the single-pass window diff (r14 optimization).

``diff_snapshots``'s 4-join digest formulation was rewritten as one
union + two window passes (one scan per side, two exchanges). The two
formulations must emit EXACTLY the same rows — including the corner
cases the window form had to special-case: duplicate rows per key,
NULL primary keys (join equality never matches NULL; window
partitioning groups them), and preimage emission."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.writers import CommitLogTableStore


def _rows(df):
    return sorted(
        (tuple((c, r[c]) for c in sorted(df.columns)) for r in df.collect()),
        key=repr,
    )


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path), "t")


def _seed(spark, store):
    """v1: ids 1..8 (+ a NULL-id row, + id 5 duplicated); v2: delete
    2,3, update 4,5 (both copies via append of new versions), insert
    9,10, leave the rest — via appends/merges that produce a messy
    multi-dir window."""
    base = spark.createDataFrame(
        [(i, f"v{i}", i * 10) for i in range(1, 9)]
        + [(None, "nullkey", 0), (5, "v5-dup", 50)],
        "id int, s string, n int",
    )
    store.write_append(base, "ev")  # v1
    store.merge_into(
        "ev",
        spark.createDataFrame([(2,), (3,)], "id int"),
        ["id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )  # v2
    store.merge_into(
        "ev",
        spark.createDataFrame(
            [(4, "V4", 400), (5, "V5", 500), (9, "v9", 90), (10, "v10", 100)],
            "id int, s string, n int",
        ),
        ["id"],
        when_matched_update={"s": "s.s", "n": "s.n"},
        when_not_matched_insert=True,
    )  # v3
    # another NULL-id row lands on the new side only
    store.write_append(
        spark.createDataFrame([(None, "nullkey2", 1)], "id int, s string, n int"),
        "ev",
    )  # v4
    return store.latest_version("ev")


@pytest.mark.parametrize("preimages", [False, True])
def test_single_pass_equals_join_formulation(spark, store, preimages):
    head = _seed(spark, store)
    try:
        CommitLogTableStore.DIFF_SINGLE_PASS = True
        fast = store.diff_snapshots(
            "ev", 1, head, primary_keys=["id"], include_preimages=preimages
        )
        fast_rows = _rows(fast)
        CommitLogTableStore.DIFF_SINGLE_PASS = False
        slow = store.diff_snapshots(
            "ev", 1, head, primary_keys=["id"], include_preimages=preimages
        )
        slow_rows = _rows(slow)
    finally:
        CommitLogTableStore.DIFF_SINGLE_PASS = True
    assert fast_rows == slow_rows
    # sanity: the window actually produced every change class
    kinds = {dict(r)["_change_type"] for r in fast_rows}
    want = {"insert", "update_postimage", "delete"}
    if preimages:
        want.add("update_preimage")
    assert want <= kinds


def test_single_pass_from_empty_base(spark, store):
    """from_version=0 (no old side) and a one-commit window still
    classify correctly through the single-pass path."""
    store.write_append(
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string"), "t2"
    )
    d = store.diff_snapshots("t2", 0, 1, primary_keys=["id"])
    assert {r["_change_type"] for r in d.collect()} == {"insert"}
    assert d.count() == 2


def test_single_pass_null_keys_never_match(spark, store):
    """A NULL-key row present on both sides with IDENTICAL payload
    must still diff as delete + insert (join semantics: NULL never
    matches), not be suppressed as unchanged."""
    store.write_append(
        spark.createDataFrame([(None, "same"), (1, "x")], "id int, s string"),
        "t3",
    )  # v1
    # replace with the same NULL-key payload plus a changed id=1
    store.write_replace(
        spark.createDataFrame([(None, "same"), (1, "y")], "id int, s string"),
        "t3",
    )  # v2
    d = store.diff_snapshots("t3", 1, 2, primary_keys=["id"]).collect()
    kinds = sorted(
        (r["_change_type"], r["s"], r["id"]) for r in d
    )
    # id=1 updated; the NULL-key row is delete+insert of 'same'
    assert ("update_postimage", "y", 1) in kinds
    assert ("insert", "same", None) in kinds
    assert ("delete", "same", None) in kinds
