"""Round-6 hardening: DML vs concurrent metadata commits, physical-name
pk guards, vacuum's sidecar GC race, atomic commit-JSON overwrite, and
manifest-sidecar schema-evolution passthrough.

Each test pins one of the round-5 advisory findings:
- a DML rebase must NOT republish pre-race checks/column mapping when a
  concurrent metadata-only commit landed (entries unchanged is not
  "commutable append");
- update_where's primary-key guard compares PHYSICAL names, so a
  renamed pk cannot be rewritten under its new logical name;
- rename_column / drop_column carry ``checks`` forward;
- vacuum never deletes a checkpoint sidecar staged by an in-flight
  (higher-version) writer;
- parquet sidecar round-trips preserve unknown entry/file keys.
"""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from pyairbyte_spark import manifest as mf
from pyairbyte_spark.writers import (
    CommitLogTableStore,
    ConcurrentCommitError,
)


@pytest.fixture()
def store(spark, tmp_path):
    return CommitLogTableStore(spark, str(tmp_path / "wh"), "main")


def _df(spark, rows, raw_prefix="r"):
    df = spark.createDataFrame(rows, ["id", "v"])
    return df.withColumn(
        "_airbyte_raw_id", F.concat(F.lit(raw_prefix), F.col("id").cast("string"))
    ).withColumn("_airbyte_extracted_at", F.current_timestamp())


# -- DML vs concurrent metadata commits ------------------------------------


def test_delete_aborts_on_concurrent_set_check(spark, store, monkeypatch):
    """A metadata-only commit (set_check) leaves entries unchanged, so
    the old rebase treated it as a commutable zero-file append and
    republished the PRE-RACE manifest fields — silently reverting the
    concurrently-added CHECK. It must abort instead (Delta aborts DML
    on concurrent metadata changes)."""
    store.write_append(
        _df(spark, [(i, f"v{i}") for i in range(10)]).coalesce(1), "t"
    )
    real_commit = CommitLogTableStore._commit
    raced = {"done": False}

    def racing_commit(self, table_name, manifest, version):
        if manifest.get("op") == "delete" and not raced["done"]:
            raced["done"] = True
            store.set_check("t", "id_nonneg", "id >= 0")
        return real_commit(self, table_name, manifest, version)

    monkeypatch.setattr(CommitLogTableStore, "_commit", racing_commit)
    with pytest.raises(ConcurrentCommitError, match="metadata"):
        store.delete_where("t", [("id", "<", 3)])
    monkeypatch.undo()
    # The raced check survived, and re-running the delete resolves.
    assert store.table_checks("t") == {"id_nonneg": "id >= 0"}
    res = store.delete_where("t", [("id", "<", 3)])
    assert res["deleted_rows"] == 3
    assert store.table_checks("t") == {"id_nonneg": "id >= 0"}


def test_update_aborts_on_concurrent_rename(spark, store, monkeypatch):
    store.write_append(
        _df(spark, [(i, f"v{i}") for i in range(6)]).coalesce(1), "t"
    )
    real_commit = CommitLogTableStore._commit
    raced = {"done": False}

    def racing_commit(self, table_name, manifest, version):
        if manifest.get("op") == "update" and not raced["done"]:
            raced["done"] = True
            store.rename_column("t", "v", "val")
        return real_commit(self, table_name, manifest, version)

    monkeypatch.setattr(CommitLogTableStore, "_commit", racing_commit)
    with pytest.raises(ConcurrentCommitError, match="metadata"):
        store.update_where("t", [("id", "<", 3)], {"v": "upper(v)"})
    monkeypatch.undo()
    assert "val" in store.read("t").columns  # rename survived


def test_dml_still_rebases_past_plain_append(spark, store, monkeypatch):
    """The metadata comparison must not break the legitimate rebase:
    a concurrent append carrying IDENTICAL metadata still commutes."""
    store.write_append(
        _df(spark, [(i, f"v{i}") for i in range(10)]).coalesce(1), "t"
    )
    store.set_check("t", "id_nonneg", "id >= 0")
    real_commit = CommitLogTableStore._commit
    raced = {"done": False}

    def racing_commit(self, table_name, manifest, version):
        if manifest.get("op") == "delete" and not raced["done"]:
            raced["done"] = True
            store.write_append(
                _df(spark, [(100, "x")], "s").coalesce(1), "t"
            )
        return real_commit(self, table_name, manifest, version)

    monkeypatch.setattr(CommitLogTableStore, "_commit", racing_commit)
    res = store.delete_where("t", [("id", "<", 3)])
    monkeypatch.undo()
    assert res["deleted_rows"] == 3
    assert store.read("t").count() == 8  # 7 survivors + raced append
    assert store.table_checks("t") == {"id_nonneg": "id >= 0"}


# -- physical-name pk guard -------------------------------------------------


def test_update_where_blocks_renamed_pk(spark, store):
    """primary_keys stores PHYSICAL names; after rename id→ident the
    guard must still catch update_where({'ident': …})."""
    store.write_merge(
        _df(spark, [(1, "a"), (2, "b")]).coalesce(1), "t", ["id"]
    )
    store.rename_column("t", "id", "ident")
    with pytest.raises(ValueError, match="primary key"):
        store.update_where("t", [("v", "=", "a")], {"ident": "ident + 10"})
    # non-pk updates under the new mapping still work
    res = store.update_where("t", [("ident", "=", 1)], {"v": "'z'"})
    assert res["updated_rows"] == 1
    rows = sorted(
        (r["ident"], r["v"])
        for r in store.read("t").select("ident", "v").collect()
    )
    assert rows == [(1, "z"), (2, "b")]


# -- metadata carry through rename/drop ------------------------------------


def test_rename_column_preserves_checks_on_other_columns(spark, store):
    store.write_append(
        _df(spark, [(1, "a"), (2, "b")]).coalesce(1), "t"
    )
    store.set_check("t", "id_pos", "id > 0")
    store.rename_column("t", "v", "val")
    assert store.table_checks("t") == {"id_pos": "id > 0"}
    # and the check is still ENFORCED post-rename
    from pyairbyte_spark.expectations import ExpectationViolation

    with pytest.raises(ExpectationViolation):
        store.write_append(
            _df(spark, [(-1, "bad")]).withColumnRenamed("v", "val").coalesce(1),
            "t",
        )


def test_drop_column_preserves_checks_on_other_columns(spark, store):
    df = _df(spark, [(1, "a")]).withColumn("extra_col", F.lit(1))
    store.write_append(df.coalesce(1), "t")
    store.set_check("t", "id_pos", "id > 0")
    store.drop_column("t", "extra_col")
    assert store.table_checks("t") == {"id_pos": "id > 0"}


# -- vacuum sidecar GC race -------------------------------------------------


def test_vacuum_keeps_inflight_sidecar(spark, store, monkeypatch):
    """stage-then-publish: a writer's checkpoint sidecar exists BEFORE
    its commit JSON. A vacuum running in that window must not delete
    it — the published commit would reference a missing sidecar."""
    monkeypatch.setattr(mf, "PARQUET_CHECKPOINT_MIN_ENTRIES", 1)
    for i in range(3):
        store.write_append(
            _df(spark, [(i, f"v{i}")], f"p{i}").coalesce(1), "t"
        )
    d = store._commits_dir("t")
    latest = store.latest_version("t")
    # simulate the in-flight writer: sidecar staged for version+1,
    # commit JSON not yet published
    inflight = f"{latest + 1:020d}.deadbeef.checkpoint.parquet"
    store.io.write_bytes(
        os.path.join(d, inflight),
        mf.entries_to_parquet_bytes([{"path": "d-x", "buckets": None,
                                      "files": []}]),
    )
    store.vacuum("t", keep_commits=1)
    assert inflight in store.io.list_names(d)
    # …while a genuinely dead sidecar below the kept horizon is GC'd:
    dead = f"{0:020d}.00000000.checkpoint.parquet"
    store.io.write_bytes(
        os.path.join(d, dead),
        mf.entries_to_parquet_bytes([{"path": "d-y", "buckets": None,
                                      "files": []}]),
    )
    store.vacuum("t", keep_commits=1)
    assert dead not in store.io.list_names(d)
    # table still fully readable after both vacuums
    assert store.read("t").count() == 3


# -- sidecar schema-evolution passthrough ----------------------------------


def test_sidecar_roundtrip_preserves_unknown_keys():
    entries = [
        {
            "path": "d-abc",
            "buckets": [0, 1],
            "files": [
                {
                    "path": "part-0.parquet",
                    "bucket": 0,
                    "bytes": 123,
                    "rows": 10,
                    "sv": 2,
                    "stats": {"id": [1, 9, 0]},
                    "future_field": {"nested": True},
                }
            ],
            "entry_future": "kept",
        },
        {"path": "d-nofiles", "buckets": None, "files": None},
    ]
    out = mf.entries_from_parquet_bytes(mf.entries_to_parquet_bytes(entries))
    assert out == entries


def test_sidecar_roundtrip_identity_without_extras():
    entries = [
        {
            "path": "d-1",
            "buckets": None,
            "files": [{"path": "f.parquet", "bucket": None, "bytes": 1}],
        }
    ]
    out = mf.entries_from_parquet_bytes(mf.entries_to_parquet_bytes(entries))
    assert out == entries


# -- atomic commit-JSON overwrite ------------------------------------------


def test_hadoop_write_bytes_overwrite_swap(spark, tmp_path):
    """write_bytes over an existing path goes through FileContext's
    OVERWRITE rename (atomic namespace op on HDFS — the local FC used
    here can't prove atomicity, so this pins the functional contract:
    clean swap, no temp litter, fresh create still works)."""
    from pyairbyte_spark.fileio import HadoopFileIO

    fio = HadoopFileIO(spark, f"file://{tmp_path}")
    p = str(tmp_path / "commit.json")
    fio.write_text(p, "old")
    for i in range(5):
        fio.write_text(p, f"v{i}")
        assert fio.read_text(p) == f"v{i}"
    leftovers = [n for n in os.listdir(tmp_path) if ".tmp" in n]
    assert leftovers == []
    p2 = str(tmp_path / "fresh.json")
    fio.write_text(p2, "created")
    assert fio.read_text(p2) == "created"


# -- latest-version pointer (commit-dir listing ceiling) --------------------


def test_latest_pointer_written_and_used(spark, store):
    store.write_append(_df(spark, [(1, "a")]).coalesce(1), "t")
    store.write_append(_df(spark, [(2, "b")], "s").coalesce(1), "t")
    d = store._commits_dir("t")
    ptr = os.path.join(d, store._LATEST_PTR)
    assert json.loads(store.io.read_text(ptr)) == {"version": 2}
    assert store._discover_latest("t") == 2


def test_stale_pointer_probes_forward(spark, store):
    for i in range(5):
        store.write_append(_df(spark, [(i, "x")], f"p{i}").coalesce(1), "t")
    d = store._commits_dir("t")
    # regress the pointer (a slow racing writer can leave it behind)
    store.io.write_text(
        os.path.join(d, store._LATEST_PTR), json.dumps({"version": 2})
    )
    assert store._discover_latest("t") == 5
    assert store.read("t").count() == 5


def test_missing_or_corrupt_pointer_falls_back_to_listing(spark, store):
    store.write_append(_df(spark, [(1, "a")]).coalesce(1), "t")
    d = store._commits_dir("t")
    ptr = os.path.join(d, store._LATEST_PTR)
    store.io.delete_file(ptr)
    assert store._discover_latest("t") == 1  # listing fallback
    store.io.write_text(ptr, "not json{")
    assert store._discover_latest("t") == 1
    # next commit heals the pointer
    store.write_append(_df(spark, [(2, "b")], "s").coalesce(1), "t")
    assert json.loads(store.io.read_text(ptr)) == {"version": 2}


def test_pointer_survives_vacuum(spark, store):
    for i in range(4):
        store.write_append(_df(spark, [(i, "x")], f"p{i}").coalesce(1), "t")
    store.vacuum("t", keep_commits=1)
    assert store._discover_latest("t") == 4
    assert store.read("t").count() == 4
