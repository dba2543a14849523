"""Incremental manifests: delta encoding, chain resolution,
checkpointing, and vacuum interaction.

The scaling fix this verifies: a commit's stored JSON is O(changed
entries), not O(table) — an append to a wide table writes one entry's
worth of manifest, while every CHECKPOINT_INTERVAL-th commit (and any
full rewrite) is a self-contained checkpoint bounding read chains.
"""

from __future__ import annotations

import json
import os

import pytest
from hypothesis import given, settings, strategies as hst
from pyspark.sql import functions as F

from pyairbyte_spark import manifest as mf
from pyairbyte_spark.writers import CommitLogTableStore


# -- pure-JSON layer --------------------------------------------------------


def _e(path, buckets=None, files=()):
    return {"path": path, "buckets": buckets, "files": list(files)}


def test_diff_apply_roundtrip_simple():
    old = [_e("a"), _e("b", [0, 1]), _e("c"), _e("x")]
    # x removed, b narrowed, d added; a and c carried
    new = [_e("a"), _e("b", [1]), _e("c"), _e("d")]
    delta = mf.diff_entries(old, new)
    assert delta is not None
    assert delta["remove_paths"] == ["x"]
    assert [e["path"] for e in delta["add_entries"]] == ["d"]
    assert list(delta["replace_entries"]) == ["b"]
    assert mf.apply_delta(old, delta) == new


def test_diff_refuses_when_full_is_no_bigger():
    # every entry changes → the delta would not be smaller than full
    old = [_e("a"), _e("b", [0, 1]), _e("c")]
    new = [_e("a"), _e("b", [1]), _e("d")]
    assert mf.diff_entries(old, new) is None


def test_diff_refuses_full_turnover_and_reorder():
    old = [_e("a"), _e("b")]
    assert mf.diff_entries(old, [_e("x"), _e("y")]) is None  # full turnover
    assert mf.diff_entries(old, [_e("b"), _e("a")]) is None  # reorder
    # insertion in the middle is not representable either
    assert mf.diff_entries(old, [_e("a"), _e("m"), _e("b")]) is None


_paths = hst.lists(
    hst.text(alphabet="abcdef", min_size=1, max_size=3), unique=True,
    min_size=0, max_size=6,
)


@given(old_paths=_paths, data=hst.data())
@settings(max_examples=200, deadline=None)
def test_diff_apply_roundtrip_property(old_paths, data):
    """Whenever diff_entries encodes a transition, apply_delta must
    reproduce the new entry list exactly (order included)."""
    old = [_e(p, buckets=[len(p)]) for p in old_paths]
    keep = [p for p in old_paths if data.draw(hst.booleans(), label=f"keep {p}")]
    changed = {
        p for p in keep if data.draw(hst.booleans(), label=f"change {p}")
    }
    new = [
        _e(p, buckets=[99] if p in changed else [len(p)]) for p in keep
    ]
    n_add = data.draw(hst.integers(0, 3), label="adds")
    new += [_e(f"new{i}") for i in range(n_add)]
    delta = mf.diff_entries(old, new)
    if delta is not None:
        assert mf.apply_delta(old, delta) == new


def test_resolve_chain_and_root():
    raws = {
        1: {"version": 1, "op": "append", "entries": [_e("a")]},
        2: {
            "version": 2, "op": "append", "base": 1,
            "add_entries": [_e("b")], "replace_entries": {}, "remove_paths": [],
        },
        3: {
            "version": 3, "op": "delete", "base": 2,
            "add_entries": [], "replace_entries": {}, "remove_paths": ["a"],
        },
    }
    man = mf.resolve_manifest(raws.__getitem__, 3)
    assert [e["path"] for e in man["entries"]] == ["b"]
    assert man["op"] == "delete" and man["version"] == 3
    assert "base" not in man and "remove_paths" not in man
    assert mf.chain_root(raws.__getitem__, 3) == 1
    assert mf.chain_root(raws.__getitem__, 1) == 1


# -- store integration ------------------------------------------------------


def _df(spark, rows, raw_prefix="r"):
    df = spark.createDataFrame(rows, ["id", "v"])
    return df.withColumn(
        "_airbyte_raw_id", F.concat(F.lit(raw_prefix), F.col("id").cast("string"))
    ).withColumn("_airbyte_extracted_at", F.current_timestamp())


def _rows(df):
    return sorted((r["id"], r["v"]) for r in df.select("id", "v").collect())


def _raw(store, table, version):
    p = os.path.join(store._commits_dir(table), f"{version:020d}.json")
    with open(p) as f:
        return json.load(f)


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path / "wh"), "main")


def test_appends_store_deltas_commit_cost_is_o_changed(spark, store):
    for i in range(5):
        store.write_append(_df(spark, [(i, f"v{i}")], f"p{i}").coalesce(1), "t")
    # v1 is the creation checkpoint; v2..v5 are deltas with ONE add each
    assert "entries" in _raw(store, "t", 1)
    for v in range(2, 6):
        raw = _raw(store, "t", v)
        assert raw["base"] == v - 1
        assert len(raw["add_entries"]) == 1
        assert not raw["remove_paths"] and not raw["replace_entries"]
    # commit JSON stays ~constant size while the table grows
    sizes = [
        os.path.getsize(
            os.path.join(store._commits_dir("t"), f"{v:020d}.json")
        )
        for v in range(2, 6)
    ]
    assert max(sizes) < 2 * min(sizes)
    # resolution gives the full view
    assert _rows(store.read("t")) == [(i, f"v{i}") for i in range(5)]
    assert _rows(store.read_version("t", 3)) == [(i, f"v{i}") for i in range(3)]


@pytest.mark.slow
def test_checkpoint_interval_forces_full_manifest(spark, store, monkeypatch):
    monkeypatch.setattr(mf, "CHECKPOINT_INTERVAL", 4)
    for i in range(9):
        store.write_append(_df(spark, [(i, "x")], f"p{i}").coalesce(1), "t")
    for v in range(1, 10):
        raw = _raw(store, "t", v)
        if v == 1 or v % 4 == 0:
            assert "entries" in raw, f"v{v} should be a checkpoint"
        else:
            assert raw["base"] == v - 1, f"v{v} should be a delta"
    # a fresh reader resolves through the chain correctly
    fresh = CommitLogTableStore(
        spark, os.path.dirname(store.root), os.path.basename(store.root)
    )
    assert fresh.read("t").count() == 9
    assert fresh.read_version("t", 6).count() == 6


@pytest.mark.slow
def test_incremental_merge_delta_touches_only_changed_entries(spark, tmp_path):
    """On a manifest with several carried entries, an incremental
    merge stores a delta whose actions cover only the touched buckets'
    entries — O(changed), the whole point."""
    store = CommitLogTableStore(spark, str(tmp_path / "wh"), "m", merge_buckets=8)
    store.write_merge(_df(spark, [(i, "v0") for i in range(64)], "a"), "t", ["id"])
    for i, pid in enumerate((100, 101, 102)):
        store.write_append(
            _df(spark, [(pid, "app")], f"p{i}").coalesce(1), "t", ["id"]
        )
    store.write_merge(_df(spark, [(5, "v1")], "b"), "t", ["id"])
    raw = _raw(store, "t", 5)
    assert raw["base"] == 4
    assert len(raw["add_entries"]) == 1  # the staged touched-bucket dir
    # only entries holding bucket(5) are replaced/removed — never all 4
    assert len(raw["replace_entries"]) + len(raw["remove_paths"]) <= 3
    rows = _rows(store.read("t"))
    assert rows.count((5, "v1")) == 1 and (5, "v0") not in rows
    assert len(rows) == 67


def test_dml_and_cdf_work_across_delta_chains(spark, store):
    store.write_append(_df(spark, [(i, f"v{i}") for i in range(10)]).coalesce(1), "t")
    store.write_append(
        _df(spark, [(i, f"v{i}") for i in range(10, 20)], "s").coalesce(1), "t"
    )
    assert store.delete_where("t", [("id", "<", 3)])["deleted_rows"] == 3
    assert (
        store.update_where("t", [("id", ">=", 18)], {"v": F.lit("U")})[
            "updated_rows"
        ]
        == 2
    )
    assert store.read("t").count() == 17
    feed = store.read_changes("t", 2)
    kinds = {r["_change_type"] for r in feed.select("_change_type").collect()}
    assert kinds == {"delete", "update_postimage"}


def test_vacuum_checkpoints_oldest_kept_delta(spark, store):
    for i in range(6):
        store.write_append(_df(spark, [(i, "x")], f"p{i}").coalesce(1), "t")
    assert "base" in _raw(store, "t", 4)  # delta before vacuum
    store.vacuum("t", keep_commits=3)  # keeps v4, v5, v6; deletes v1-3
    raw4 = _raw(store, "t", 4)
    assert "entries" in raw4 and "base" not in raw4  # checkpointed
    # every kept version resolvable by a fresh reader
    fresh = CommitLogTableStore(
        spark, os.path.dirname(store.root), os.path.basename(store.root)
    )
    assert fresh.read_version("t", 4).count() == 4
    assert fresh.read_version("t", 5).count() == 5
    assert fresh.read("t").count() == 6
    with pytest.raises(FileNotFoundError):
        fresh.read_version("t", 2)


def test_history_reports_delta_commits(spark, store):
    store.write_append(_df(spark, [(1, "a")]).coalesce(1), "t")
    store.write_append(_df(spark, [(2, "b")], "s").coalesce(1), "t")
    hist = {h["version"]: h for h in store.history("t")}
    assert hist[1]["n_entries"] == 1
    assert hist[2]["incremental"] and hist[2]["n_changed"] == 1


# -- parquet checkpoints ----------------------------------------------------


def test_parquet_entries_roundtrip_shapes():
    entries = [
        {"path": "d-aaa", "buckets": None, "files": None},  # pre-stats
        {"path": "d-bbb", "buckets": [], "files": []},
        {
            "path": "d-ccc",
            "buckets": [0, 3],
            "files": [
                {
                    "path": "__pk_bucket=0/part-1.parquet",
                    "bucket": 0,
                    "bytes": 1234,
                    "rows": 10,
                    "stats": {"id": {"min": 1, "max": 9, "nulls": 0}},
                    "sv": 2,
                },
                {"path": "p2.parquet", "bucket": None, "bytes": 5},
            ],
        },
    ]
    data = mf.entries_to_parquet_bytes(entries)
    assert mf.entries_from_parquet_bytes(data) == entries


@pytest.mark.slow
def test_wide_manifest_spills_to_parquet_checkpoint(spark, store, monkeypatch):
    monkeypatch.setattr(mf, "PARQUET_CHECKPOINT_MIN_ENTRIES", 3)
    monkeypatch.setattr(mf, "CHECKPOINT_INTERVAL", 4)
    for i in range(8):
        store.write_append(_df(spark, [(i, f"v{i}")], f"p{i}").coalesce(1), "t")
    d = store._commits_dir("t")
    raw8 = _raw(store, "t", 8)  # forced-full at the interval, 8 entries
    assert "entries" not in raw8 and raw8["entries_ref"].endswith(
        ".checkpoint.parquet"
    )
    assert raw8["n_entries"] == 8
    assert os.path.exists(os.path.join(d, raw8["entries_ref"]))
    # a fresh reader resolves through the checkpoint
    fresh = CommitLogTableStore(
        spark, os.path.dirname(store.root), os.path.basename(store.root)
    )
    assert _rows(fresh.read("t")) == [(i, f"v{i}") for i in range(8)]
    assert fresh.read_version("t", 6).count() == 6  # delta atop v4 full
    hist = {h["version"]: h for h in fresh.history("t")}
    assert hist[8]["n_entries"] == 8 and hist[8]["checkpoint"]
    # DML through the checkpointed snapshot
    assert fresh.delete_where("t", [("id", "<", 2)])["deleted_rows"] == 2
    assert fresh.read("t").count() == 6


def test_vacuum_reclaims_dropped_and_orphan_sidecars(spark, store, monkeypatch):
    monkeypatch.setattr(mf, "PARQUET_CHECKPOINT_MIN_ENTRIES", 2)
    monkeypatch.setattr(mf, "CHECKPOINT_INTERVAL", 3)
    for i in range(7):
        store.write_append(_df(spark, [(i, "x")], f"p{i}").coalesce(1), "t")
    d = store._commits_dir("t")
    # plant a lost-race orphan BELOW the kept horizon (v1 was claimed
    # by another writer) and an in-flight writer's sidecar ABOVE it
    # (v8 staged, commit JSON not yet published — stage-then-publish)
    orphan = os.path.join(d, f"{1:020d}.deadbeef.checkpoint.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    inflight = os.path.join(d, f"{8:020d}.deadbeef.checkpoint.parquet")
    with open(inflight, "wb") as f:
        f.write(b"junk")
    store.vacuum("t", keep_commits=2)  # keeps v6, v7
    names = set(os.listdir(d))
    assert not any(n.startswith("0" * 18 + "03.") and n.endswith(".parquet")
                   for n in names)  # v3's sidecar dropped with v3
    assert os.path.basename(orphan) not in names
    # version-gated GC: the future-versioned sidecar may belong to an
    # in-flight writer about to publish — it must survive the sweep
    assert os.path.basename(inflight) in names
    os.unlink(inflight)
    # the oldest kept (v6, was a checkpoint at interval 3? v6 = full) —
    # whatever its form, every kept version stays readable
    fresh = CommitLogTableStore(
        spark, os.path.dirname(store.root), os.path.basename(store.root)
    )
    assert fresh.read_version("t", 6).count() == 6
    assert fresh.read("t").count() == 7
    # kept checkpoints' sidecars survive
    for n in names:
        if n.endswith(".json"):
            ref = json.loads(open(os.path.join(d, n)).read()).get("entries_ref")
            if ref:
                assert ref in names


_stats_vals = hst.one_of(hst.integers(-1000, 1000), hst.none())


@given(data=hst.data())
@settings(max_examples=100, deadline=None)
def test_parquet_entries_roundtrip_property(data):
    """ANY entry-list shape the store can produce must survive the
    parquet encoding byte-exactly (as dict equality)."""
    n = data.draw(hst.integers(0, 5), label="entries")
    entries = []
    for i in range(n):
        kind = data.draw(hst.sampled_from(["prestats", "empty", "files"]),
                         label=f"kind{i}")
        buckets = data.draw(
            hst.one_of(hst.none(), hst.lists(hst.integers(0, 7), max_size=4)),
            label=f"buckets{i}",
        )
        e = {"path": f"d-{i:03d}", "buckets": buckets}
        if kind == "prestats":
            e["files"] = None
        elif kind == "empty":
            e["files"] = []
        else:
            files = []
            for j in range(data.draw(hst.integers(1, 3), label=f"nf{i}")):
                f = {
                    "path": f"part-{i}-{j}.parquet",
                    "bucket": data.draw(
                        hst.one_of(hst.none(), hst.integers(0, 7)),
                        label=f"b{i}{j}",
                    ),
                    "bytes": data.draw(hst.integers(0, 1 << 30),
                                       label=f"by{i}{j}"),
                }
                if data.draw(hst.booleans(), label=f"rows?{i}{j}"):
                    f["rows"] = data.draw(hst.integers(0, 10**6),
                                          label=f"r{i}{j}")
                    f["stats"] = {
                        "c": {
                            "min": data.draw(_stats_vals, label=f"mn{i}{j}"),
                            "max": data.draw(_stats_vals, label=f"mx{i}{j}"),
                            "nulls": data.draw(_stats_vals, label=f"nl{i}{j}"),
                        }
                    }
                    f["sv"] = 2
                files.append(f)
            e["files"] = files
        entries.append(e)
    assert mf.entries_from_parquet_bytes(
        mf.entries_to_parquet_bytes(entries)
    ) == entries


def test_crash_between_sidecar_and_commit_json(spark, store, monkeypatch):
    """Kill the writer AFTER the checkpoint sidecar lands but BEFORE
    the commit JSON: previous snapshot intact, re-run converges, and
    vacuum reclaims the orphan sidecar."""
    monkeypatch.setattr(mf, "PARQUET_CHECKPOINT_MIN_ENTRIES", 1)
    store.write_append(_df(spark, [(1, "a")]).coalesce(1), "t")

    real_put = type(store.io).put_if_absent
    def boom(io_self, path, data):
        raise RuntimeError("injected crash after sidecar, before JSON")

    monkeypatch.setattr(type(store.io), "put_if_absent", boom)
    with pytest.raises(RuntimeError, match="injected"):
        store.write_replace(_df(spark, [(2, "b")], "s").coalesce(1), "t")
    monkeypatch.setattr(type(store.io), "put_if_absent", real_put)
    store._invalidate_manifests("t")
    d = store._commits_dir("t")
    orphans = [n for n in os.listdir(d) if n.endswith(".checkpoint.parquet")
               and n.startswith(f"{2:020d}.")]
    assert orphans  # the sidecar landed before the crash
    assert _rows(store.read("t")) == [(1, "a")]  # snapshot intact
    store.write_replace(_df(spark, [(2, "b")], "z").coalesce(1), "t")
    assert _rows(store.read("t")) == [(2, "b")]
    # sidecar GC is version-gated (an unreferenced sidecar at or above
    # the kept horizon may belong to an in-flight writer), so the v2
    # orphan is reclaimed once the vacuum horizon moves past v2
    store.write_replace(_df(spark, [(3, "c")], "w").coalesce(1), "t")
    store.vacuum("t", keep_commits=1)  # keeps v3 → horizon above v2
    left = [n for n in os.listdir(d) if n in orphans]
    assert not left  # orphan reclaimed
