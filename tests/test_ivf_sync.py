"""CDF-maintained IVF vector index (``sync_ivf_index``): the vector
family joins the text/MinHash follows-source-DML lifecycle. Deleted
and updated vectors retract as sign-tombstone list rows derived from
the SOURCE's old snapshot (re-assigned to the frozen quantizer —
O(changed docs), zero lists I/O); inserts/updates append rows stamped
seq=head; lists + cursor move as one txn group. With n_probes ==
n_centroids the probe is EXACT, so the gate is equality with
brute-force top-k over the final corpus state.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark.operators.similarity import (
    attach_ivf_index,
    brute_force_topk,
    fold_ivf_index,
    ivf_index_debt,
    ivf_index_topk,
    sync_ivf_index,
)
from pyairbyte_spark.writers import CommitLogTableStore


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path / "wh"), "main")


def _vecs(spark, ids, dim=8, shift=0.0):
    rows = [
        (
            i,
            [
                round(((i * 31 + j * 7 + 13) % 17) / 17.0 + shift, 6)
                for j in range(dim)
            ],
        )
        for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _topk(df):
    return sorted(map(tuple, df.collect()))


def test_sync_tracks_table_dml_exact_vs_bruteforce(spark, store):
    store.write_append(_vecs(spark, range(0, 40)), "emb", ["vec_id"])
    attach_ivf_index(store, "emb", "ix", n_centroids=4, target_files=4)
    # delete a slice, update another (shifted vectors), insert fresh
    store.merge_into(
        "emb",
        spark.createDataFrame([(i,) for i in range(0, 8)], "vec_id long"),
        ["vec_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    store.merge_into(
        "emb",
        _vecs(spark, range(8, 14), shift=0.25),
        ["vec_id"],
        when_matched_update={"embedding": "s.embedding"},
    )
    store.write_append(_vecs(spark, range(100, 110)), "emb", ["vec_id"])
    r = sync_ivf_index(store, "ix")
    assert r["docs_changed"] == 8 + 6 + 6 + 10 and not r.get("raced")
    final = store.read("emb")
    queries = _vecs(spark, [500, 501], shift=0.1)
    got = ivf_index_topk(store, "ix", queries, k=5, n_probes=4)
    want = brute_force_topk(final, queries, k=5)
    assert _topk(got) == _topk(want)
    # no-op when caught up; a second churn round stays exact
    assert sync_ivf_index(store, "ix")["docs_changed"] == 0
    store.merge_into(
        "emb",
        spark.createDataFrame([(100,), (9,)], "vec_id long"),
        ["vec_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    sync_ivf_index(store, "ix")
    got2 = ivf_index_topk(store, "ix", queries, k=5, n_probes=4)
    want2 = brute_force_topk(store.read("emb"), queries, k=5)
    assert _topk(got2) == _topk(want2)


def test_sync_never_scans_lists(spark, store, monkeypatch):
    """Plan gate: tombstones derive from the source's old snapshot —
    evaluating any lists-table row during the sync is poisoned."""
    store.write_append(_vecs(spark, range(0, 20)), "emb", ["vec_id"])
    attach_ivf_index(store, "emb", "ix", n_centroids=4)
    store.merge_into(
        "emb",
        spark.createDataFrame([(1,)], "vec_id long"),
        ["vec_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    orig_read, orig_rw = store.read, store.read_where

    def poison(df):
        return df.filter(F.assert_true(F.lit(False)).isNull())

    monkeypatch.setattr(
        store,
        "read",
        lambda t, **k: (
            poison(orig_read(t, **k)) if t == "ix_lists" else orig_read(t, **k)
        ),
    )
    monkeypatch.setattr(
        store,
        "read_where",
        lambda t, *a, **k: (
            poison(orig_rw(t, *a, **k)) if t == "ix_lists" else orig_rw(t, *a, **k)
        ),
    )
    r = sync_ivf_index(store, "ix")
    assert r["docs_changed"] == 1
    monkeypatch.setattr(store, "read", orig_read)
    monkeypatch.setattr(store, "read_where", orig_rw)
    q = _vecs(spark, [500])
    got = ivf_index_topk(store, "ix", q, k=3, n_probes=4)
    want = brute_force_topk(store.read("emb"), q, k=3)
    assert _topk(got) == _topk(want)


def test_debt_and_fold_lifecycle(spark, store):
    store.write_append(_vecs(spark, range(0, 30)), "emb", ["vec_id"])
    attach_ivf_index(store, "emb", "ix", n_centroids=4)
    assert ivf_index_debt(store, "ix")["tombstone_fraction"] == 0.0
    store.merge_into(
        "emb",
        spark.createDataFrame([(i,) for i in range(0, 10)], "vec_id long"),
        ["vec_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    sync_ivf_index(store, "ix")
    debt = ivf_index_debt(store, "ix")["tombstone_fraction"]
    assert debt > 0.2
    # the store doctor routes the debt to the fold verb
    plan = store.store_maintenance_plan(tombstone_max=0.1)
    acts = [a["action"] for a in plan["indexes"]["ix"]["actions"]]
    assert "fold_ivf_index" in acts
    q = _vecs(spark, [500])
    before = _topk(ivf_index_topk(store, "ix", q, k=5, n_probes=4))
    assert fold_ivf_index(store, "ix")["folded"] is True
    assert ivf_index_debt(store, "ix")["tombstone_fraction"] == 0.0
    assert store.read("ix_lists").filter(F.col("sign") < 0).count() == 0
    after = _topk(ivf_index_topk(store, "ix", q, k=5, n_probes=4))
    assert before == after == _topk(
        brute_force_topk(store.read("emb"), q, k=5)
    )
    assert store.store_maintenance_plan(tombstone_max=0.1)["indexes"]["ix"][
        "actions"
    ] == []


def test_ivf_index_follows_branch_and_survives_publish(spark, store):
    store.write_append(_vecs(spark, range(0, 20)), "emb", ["vec_id"])
    store.create_branch("emb", "audit")
    attach_ivf_index(store, "emb", "ix", n_centroids=4, ref="audit")
    bv = store.branch("audit")
    bv.merge_into(
        "emb",
        spark.createDataFrame([(i,) for i in range(0, 5)], "vec_id long"),
        ["vec_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    r = sync_ivf_index(store, "ix")
    assert r["docs_changed"] == 5
    q = _vecs(spark, [500])
    got = ivf_index_topk(store, "ix", q, k=5, n_probes=4)
    want = brute_force_topk(bv.read("emb"), q, k=5)  # the BRANCH state
    assert _topk(got) == _topk(want)
    store.publish_branch("emb", "audit")
    r2 = sync_ivf_index(store, "ix")
    assert r2.get("docs_changed") == 0
    m = store.read("ix_meta").collect()[0].asDict()
    assert m["source_ref"] is None


def test_vector_index_tool_surface(spark, tmp_path):
    from pyairbyte_spark import tools
    from pyairbyte_spark.cache import SparkCache
    from pyairbyte_spark.mcp_server import TOOL_DEFS

    cache = SparkCache(spark, str(tmp_path / "vwh"), table_format="commitlog")
    cache.write_dataframe(_vecs(spark, range(0, 20)), "emb")
    info = tools.build_vector_index(cache, "emb", n_centroids=4)
    assert info["n_vectors"] == 20
    cache.store.merge_into(
        cache.table_name("emb"),
        spark.createDataFrame([(1,)], "vec_id long"),
        ["vec_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    r = tools.sync_vector_index(cache)
    assert r["docs_changed"] == 1
    q = _vecs(spark, [500])
    got = ivf_index_topk(cache.store, "ivf", q, k=19, n_probes=4)
    ids = {row["neighbor_id"] for row in got.collect()}
    assert 1 not in ids and len(ids) == 19
    names = {d.name for d in TOOL_DEFS}
    assert {"build_vector_index", "sync_vector_index"} <= names


# -- PQ: the compressed-ANN member of the follows-DML family -------------------


def test_pq_sync_tracks_table_dml_exact(spark, store):
    """PQ probes score ADC over codes; with frozen codebooks the probe
    must equal pq_topk_int over the final corpus's codes — so the gate
    is equality with an index REBUILT (same codebooks) from the final
    state."""
    from pyairbyte_spark.operators.similarity import (
        attach_pq_index,
        fold_pq_index,
        pq_index_debt,
        pq_index_topk,
        sync_pq_index,
    )

    store.write_append(_vecs(spark, range(0, 40), dim=16), "emb", ["vec_id"])
    attach_pq_index(store, "emb", "px", m=4, ksub=4, train_modulus=2)
    store.merge_into(
        "emb",
        spark.createDataFrame([(i,) for i in range(0, 6)], "vec_id long"),
        ["vec_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    store.merge_into(
        "emb",
        _vecs(spark, range(6, 10), dim=16, shift=0.2),
        ["vec_id"],
        when_matched_update={"embedding": "s.embedding"},
    )
    store.write_append(_vecs(spark, range(200, 206), dim=16), "emb", ["vec_id"])
    r = sync_pq_index(store, "px")
    assert r["docs_changed"] == 6 + 4 + 4 + 6 and not r.get("raced")
    q = _vecs(spark, [500, 501], dim=16, shift=0.1)
    got = pq_index_topk(store, "px", q, k=5)
    # reference: rebuild with the SAME codebooks over the final corpus
    from pyairbyte_spark.operators.similarity import _read_pq_codebooks

    books, scale = _read_pq_codebooks(store, "px")
    from pyairbyte_spark.operators.similarity import build_pq_index

    store2 = CommitLogTableStore(
        spark, str(store.root) + "_ref", "ref"
    )
    build_pq_index(
        store.read("emb"), store2, "px", int_scale=scale, codebooks=books
    )
    want = pq_index_topk(store2, "px", q, k=5)
    assert _topk(got) == _topk(want)
    # debt -> doctor -> fold -> clean, results unchanged
    assert pq_index_debt(store, "px")["tombstone_fraction"] > 0
    plan = store.store_maintenance_plan(tombstone_max=0.05)
    acts = [a["action"] for a in plan["indexes"]["px"]["actions"]]
    assert "fold_pq_index" in acts
    assert fold_pq_index(store, "px")["folded"] is True
    assert pq_index_debt(store, "px")["tombstone_fraction"] == 0.0
    got2 = pq_index_topk(store, "px", q, k=5)
    assert _topk(got2) == _topk(want)


def test_pq_sync_never_scans_codes(spark, store, monkeypatch):
    from pyairbyte_spark.operators.similarity import (
        attach_pq_index,
        sync_pq_index,
    )

    store.write_append(_vecs(spark, range(0, 20), dim=16), "emb", ["vec_id"])
    attach_pq_index(store, "emb", "px", m=4, ksub=4)
    store.merge_into(
        "emb",
        spark.createDataFrame([(1,)], "vec_id long"),
        ["vec_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    orig_read, orig_rw = store.read, store.read_where

    def poison(df):
        return df.filter(F.assert_true(F.lit(False)).isNull())

    monkeypatch.setattr(
        store,
        "read",
        lambda t, **k: (
            poison(orig_read(t, **k)) if t == "px_codes" else orig_read(t, **k)
        ),
    )
    monkeypatch.setattr(
        store,
        "read_where",
        lambda t, *a, **k: (
            poison(orig_rw(t, *a, **k)) if t == "px_codes" else orig_rw(t, *a, **k)
        ),
    )
    r = sync_pq_index(store, "px")
    assert r["docs_changed"] == 1


def test_index_health_drift_ignores_dead_vectors(spark, store):
    """Advisor r12: after a delete-heavy sync the drift aggregate must
    net out the deleted vectors' rows (their +1 appends AND their -1
    retractions), not just filter sign > 0 — otherwise the retrain
    trigger keeps firing on vectors that no longer exist."""
    from pyairbyte_spark.operators.similarity import (
        attach_pq_index,
        index_health,
        sync_pq_index,
    )

    store.write_append(_vecs(spark, range(0, 40)), "emb", ["vec_id"])
    attach_pq_index(store, "emb", "px", m=4, ksub=4)
    # drifted insert: far from the training distribution -> high err
    store.write_append(_vecs(spark, range(100, 120), shift=40.0), "emb")
    sync_pq_index(store, "px")
    h1 = index_health(store, "px", kind="pq")
    assert h1["recent_err"] is not None and h1["recent_err"] > 0
    # the drifted vectors get deleted again: the corpus is back to the
    # training distribution, so the drift signal must clear
    store.merge_into(
        "emb",
        spark.createDataFrame(
            [(i,) for i in range(100, 120)], "vec_id long"
        ),
        ["vec_id"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    sync_pq_index(store, "px")
    h2 = index_health(store, "px", kind="pq")
    # every row appended since the build nets to zero -> no live
    # appended vectors -> no drift verdict (not a spurious retrain)
    assert h2["recent_err"] is None and h2["retrain"] is None
