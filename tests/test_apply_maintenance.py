"""apply_maintenance_plan (round-13 directive #6): the EXECUTOR for the
store-wide doctor. store_maintenance_plan names repair verbs; this runs
them — per-table compact/bloom-recover/vacuum, the four index families'
folds/refreshes, txn-decision vacuum — with per-action isolation, a
dry-run mode, and judgment calls (drop_ref/review_ingest/resolve)
reported but never auto-applied.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.operators.dedup import (
    attach_minhash_index,
    minhash_index_health,
    minhash_index_matches,
    sync_minhash_index,
)
from pyairbyte_spark.writers import CommitLogTableStore


@pytest.fixture()
def store(spark, tmp_path):
    st = CommitLogTableStore(spark, str(tmp_path / "wh"), "main")
    st.TXN_RESOLVE_GRACE_S = 0.2
    return st


def _docs(spark, lo, hi):
    return spark.createDataFrame(
        [
            (i, f"document number {i} talks about topic {i % 7} "
                f"and mentions keyword {i % 13} repeatedly")
            for i in range(lo, hi)
        ],
        "doc_id long, text string",
    )


def _make_sick(spark, store):
    """Three sick organs: a bloated table with a decayed bloom index,
    a tombstone-heavy minhash index, and a txn-decision backlog."""
    # organ 1: 'events' grows one dir per append (9 > default 8) and
    # the bloom index covers only the first file
    base = spark.range(0, 4000).toDF("id").withColumn(
        "v", (F.col("id") * 13) % 97
    )
    store.write_append(base.coalesce(1), "events")
    store.build_bloom_index("events", ["id"])
    for k in range(9):
        store.write_append(
            spark.range(4000 + k * 500, 4500 + k * 500)
            .toDF("id")
            .withColumn("v", F.lit(k)),
            "events",
        )
    # organ 2: attached minhash index accumulates retraction debt
    store.write_append(_docs(spark, 0, 60), "docs", ["doc_id"])
    attach_minhash_index(store, "docs", "mh")
    store.merge_into(
        "docs",
        spark.createDataFrame([(i,) for i in range(0, 20)], "doc_id long"),
        ["doc_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    sync_minhash_index(store, "mh")
    # organ 3: a txn-group decision file
    t = store.begin_txn()
    t.write_append(_docs(spark, 900, 902), "scratch")
    t.commit()


@pytest.mark.slow
def test_one_call_heals_a_seeded_sick_store(spark, store):
    _make_sick(spark, store)
    kw = dict(tombstone_max=0.1, txn_decisions_max=0)
    before = store.store_maintenance_plan(**kw)
    assert any(
        r["action"] == "compact" for r in before["tables"].get("events", [])
    )
    assert any(
        r["action"] == "refresh_bloom"
        for r in before["tables"].get("events", [])
    )
    assert any(
        a["action"] == "fold_minhash_index"
        for a in before["indexes"]["mh"]["actions"]
    )
    assert before["txn_decisions"]["actions"]
    # dry run: everything planned/skipped, nothing mutated
    dry = store.apply_maintenance_plan(plan=before, dry_run=True, **kw)
    assert dry["dry_run"] is True
    assert {a["status"] for a in dry["actions"]} <= {"planned", "skipped"}
    assert (
        minhash_index_health(store, "mh")["tombstone_fraction"] > 0.1
    )  # untouched
    # ONE healing call
    r = store.apply_maintenance_plan(**kw)
    by_key = {(a["target"], a["action"]): a for a in r["actions"]}
    assert by_key[("events", "compact")]["status"] == "applied"
    # bloom re-cover folded into the compact rewrite, not a 2nd pass
    assert "bloom" in (by_key[("events", "compact")].get("note") or "")
    assert by_key[("mh", "fold_minhash_index")]["status"] == "applied"
    assert (
        by_key[("<store>", "vacuum_txn_decisions")]["status"] == "applied"
    )
    assert not any(a["status"] == "failed" for a in r["actions"])
    # the store is healthy under the same thresholds (the txn-decision
    # backlog keeps young files by retention design — exempt it)
    after = store.store_maintenance_plan(**kw)
    assert not after["tables"]
    assert all(not v["actions"] for v in after["indexes"].values())
    # and the healed index still answers probes exactly
    q = _docs(spark, 25, 26).withColumn("doc_id", F.lit(-1).cast("long"))
    assert minhash_index_matches(store, "mh", q).count() > 0
    h = minhash_index_health(store, "mh")
    assert h["tombstone_fraction"] == 0.0 and h["coverage"] == 1.0


def test_judgment_calls_are_skipped_not_applied(spark, store):
    store.write_append(_docs(spark, 0, 10), "docs", ["doc_id"])
    store.create_branch("docs", "stale-audit")
    r = store.apply_maintenance_plan(max_ref_age_hours=0.0)
    skips = {
        (a["target"], a["action"]): a
        for a in r["actions"]
        if a["status"] == "skipped"
    }
    assert ("docs", "drop_ref") in skips
    assert "audit lineage" in skips[("docs", "drop_ref")]["note"]
    # the branch survived
    assert "stale-audit" in store.refs("docs")


def test_per_action_isolation(spark, store, monkeypatch):
    """One failing verb records 'failed'; the rest still run."""
    _make_sick(spark, store)
    kw = dict(tombstone_max=0.1, txn_decisions_max=0)
    monkeypatch.setattr(
        store,
        "compact",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("disk full")),
    )
    r = store.apply_maintenance_plan(**kw)
    by_key = {(a["target"], a["action"]): a for a in r["actions"]}
    assert by_key[("events", "compact")]["status"] == "failed"
    assert "disk full" in by_key[("events", "compact")]["error"]
    # later actions still ran — wait: fold compacts too; it may fail
    # under the poisoned compact, but the txn vacuum must still run
    assert (
        by_key[("<store>", "vacuum_txn_decisions")]["status"] == "applied"
    )


@pytest.mark.slow
def test_apply_races_concurrent_sync(spark, store):
    """The doctor's fold and a live sync interleave safely: the fold's
    guarded replace never clobbers the sync's txn group, and whatever
    the interleaving, the index converges to exactly the source."""
    store.write_append(_docs(spark, 0, 60), "docs", ["doc_id"])
    attach_minhash_index(store, "docs", "mh")
    store.merge_into(
        "docs",
        spark.createDataFrame([(i,) for i in range(0, 20)], "doc_id long"),
        ["doc_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    sync_minhash_index(store, "mh")  # debt to fold
    errs: list[Exception] = []

    def churn():
        try:
            for k in range(3):
                store.merge_into(
                    "docs",
                    spark.createDataFrame(
                        [(20 + k,)], "doc_id long"
                    ),
                    ["doc_id"],
                    when_matched_delete=True,
                    when_not_matched_insert=False,
                )
                sync_minhash_index(store, "mh")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th = threading.Thread(target=churn)
    th.start()
    r = store.apply_maintenance_plan(tombstone_max=0.05)
    th.join()
    assert not errs
    assert not any(a["status"] == "failed" for a in r["actions"])
    # converge: one final sync + probe equality with the live corpus
    sync_minhash_index(store, "mh")
    live = {r_["doc_id"] for r_ in store.read("docs").collect()}
    for probe_id in (10, 21, 30):
        q = _docs(spark, probe_id, probe_id + 1).withColumn(
            "doc_id", F.lit(-1).cast("long")
        )
        got = {
            r_["match_id"]
            for r_ in minhash_index_matches(store, "mh", q).collect()
        }
        assert (probe_id in got) == (probe_id in live)


def test_mcp_tool_registered():
    from pyairbyte_spark.mcp_server import TOOL_DEFS

    names = {d.name for d in TOOL_DEFS}
    assert "apply_store_maintenance" in names
    assert "get_store_maintenance_plan" in names
