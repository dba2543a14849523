"""Child process for ``tests/test_s3_data_plane.py``.

Runs the COMPLETE commit-log store lifecycle — append, merge,
delete_where, distributed plan_scan/read_where over the s3a sidecar
branch, compact, time travel, vacuum, plus thread races — entirely
over ``s3a://`` against an in-process moto S3 server, with Spark's
parquet data plane going through the compiled
:class:`motofs.MotoS3FileSystem` (tests/javasrc).

A child process is required because ``spark.driver.extraClassPath``
must be set before the JVM launches, and the pytest session already
holds a running JVM. Emits one JSON line of named boolean/int checks
on stdout; the parent asserts each.
"""

from __future__ import annotations

import json
import os
import sys
import threading


def main(classes_dir: str) -> None:
    from moto.server import ThreadedMotoServer

    srv = ThreadedMotoServer(port=0, verbose=False)
    srv.start()
    port = srv._server.socket.getsockname()[1]
    endpoint = f"http://127.0.0.1:{port}"

    import boto3

    client = boto3.client(
        "s3",
        endpoint_url=endpoint,
        aws_access_key_id="testing",
        aws_secret_access_key="testing",
        region_name="us-east-1",
    )
    client.create_bucket(Bucket="lake")

    from pyairbyte_spark import get_spark

    spark = get_spark(
        "s3-data-plane",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.extraClassPath": classes_dir,
            "spark.executor.extraClassPath": classes_dir,
            "spark.hadoop.fs.s3a.impl": "motofs.MotoS3FileSystem",
            "spark.hadoop.fs.s3a.endpoint": endpoint,
        },
    )
    from pyspark.sql import functions as F

    from pyairbyte_spark import manifest as mf
    from pyairbyte_spark.fileio import S3FileIO
    from pyairbyte_spark.writers import CommitLogTableStore, ConcurrentCommitError

    mf.PARQUET_CHECKPOINT_MIN_ENTRIES = 1  # force parquet sidecars

    io = S3FileIO(client, spark_scheme="s3a")
    store = CommitLogTableStore(spark, "s3a://lake/wh", "main", fileio=io)
    store.DISTRIBUTED_MANIFEST_MIN_BYTES = 0  # force the s3a sidecar branch

    def df_(rows, prefix):
        d = spark.createDataFrame(rows, ["id", "v"])
        return d.withColumn(
            "_airbyte_raw_id",
            F.concat(F.lit(prefix), F.col("id").cast("string")),
        ).withColumn("_airbyte_extracted_at", F.current_timestamp())

    def rows_(df):
        return sorted((r["id"], r["v"]) for r in df.select("id", "v").collect())

    checks: dict[str, object] = {}

    # -- raw data plane: Spark parquet write/read over s3a ------------------
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.repartition(3).write.mode("overwrite").parquet("s3a://lake/raw/events")
    back = spark.read.parquet("s3a://lake/raw/events")
    h = lambda d: d.agg(F.sum(F.hash(*sorted(d.columns)))).collect()[0][0]  # noqa: E731
    checks["raw_roundtrip"] = back.count() == events.count() and h(back) == h(events)
    # predicate pushdown survives the custom FS (pruned read < full read)
    checks["raw_filtered"] = (
        back.filter(F.col("event_type") == back.select("event_type").first()[0])
        .count() > 0
    )

    # -- store lifecycle over s3a -------------------------------------------
    store.write_append(df_([(i, f"a{i}") for i in range(10)], "a").coalesce(1), "t")
    store.write_append(
        df_([(i, f"b{i}") for i in range(10, 20)], "b").coalesce(1), "t"
    )
    checks["append_rows"] = store.read("t").count()  # 20

    store.write_merge(df_([(5, "m5"), (25, "m25")], "m"), "t", ["id"])
    merged = dict(rows_(store.read("t")))
    checks["merge_rows"] = len(merged)  # 21
    checks["merge_upsert"] = merged[5] == "m5" and merged[25] == "m25"

    store.delete_where("t", [("id", "<", 3)])
    checks["deleted_rows"] = store.read("t").count()  # 18

    # merge-on-read delete over s3a: the DV sidecar's (file, pos) keys
    # come from _metadata.file_path on s3a:// URIs — the one rendering
    # the local suite can't cover
    rm = store.delete_where("t", [("id", "in", [3, 4])], mode="mor")
    checks["mor_zero_rewrites"] = (
        rm["files_rewritten"] == 0 and rm["deleted_rows"] == 2
    )
    checks["mor_rows"] = store.read("t").count()  # 16
    checks["mor_stats"] = store.table_stats("t")["rows"] == 16

    store._invalidate_manifests("t")
    plan = store.plan_scan("t", [("id", ">=", 10)])
    checks["plan_distributed"] = plan.get("distributed") is True
    # zone maps over the s3a sidecar: a predicate matching nothing must
    # prune every file (the merge rewrite left wide per-file id ranges,
    # so a selective-but-matching predicate can legitimately keep all)
    none = store.plan_scan("t", [("id", ">", 10_000)])
    checks["plan_pruned"] = (
        none["files_selected"] == 0 and none["files_total"] > 0
    )
    got = rows_(store.read_where("t", [("id", ">=", 10)]))
    exp = sorted([(i, f"b{i}") for i in range(10, 20)] + [(25, "m25")])
    checks["read_where_match"] = got == exp

    store.compact("t")
    checks["dv_materialized"] = not (
        store._latest_commit("t")[1].get("delete_vectors") or []
    )
    exp_all = sorted(
        [(i, f"a{i}") for i in range(5, 10) if i != 5]
        + [(5, "m5")]
        + [(i, f"b{i}") for i in range(10, 20)]
        + [(25, "m25")]
    )
    checks["compact_match"] = rows_(store.read("t")) == exp_all
    checks["v1_rows"] = store.read_version("t", 1).count()  # 10 (time travel)

    # -- round-7 verbs over s3a ---------------------------------------------
    # metadata-only ADD COLUMN: pre-add rows read the default
    store.add_column("t", "tag", "string", default="old")
    checks["add_col_default"] = (
        store.read("t").filter(F.col("tag") == "old").count() == len(exp_all)
    )
    # clause MERGE INTO with a txn watermark
    src = spark.createDataFrame(
        [(25, "M25", "new"), (777, "I777", "new")], ["id", "v", "tag"]
    )
    mi = store.merge_into(
        "t",
        src,
        ["id"],
        when_matched_update={"v": "s.v", "tag": "s.tag"},
        when_not_matched_insert=True,
        txn=("s3pipe", 1),
    )
    checks["merge_into_counts"] = (
        mi["updated"] == 1 and mi["inserted"] == 1
    )
    mi2 = store.merge_into(
        "t", src, ["id"], when_matched_update={"v": "s.v"}, txn=("s3pipe", 1)
    )
    checks["merge_into_idempotent"] = mi2.get("skipped") is True
    # a small-file append tail, then bin-packing OPTIMIZE over s3a
    store.write_append(df_([(900, "f1")], "f").coalesce(1), "t")
    store.write_append(df_([(901, "f2")], "g").coalesce(1), "t")
    opt = store.optimize("t", small_file_bytes=64 << 20)
    checks["optimize_ran"] = opt["optimized"] and opt["files_rewritten"] >= 3
    got = dict(rows_(store.read("t")))
    checks["round7_rows"] = (
        got.get(25) == "M25" and got.get(777) == "I777"
        and got.get(900) == "f1"
        and len(got) == len(exp_all) + 3
    )
    exp_all = sorted(got.items())

    # -- races on the S3 backend --------------------------------------------
    # concurrent appends: every writer's conditional PUT either lands or
    # rebases; all N rows must be present afterwards
    errors: list[Exception] = []

    def appender(i):
        try:
            store.write_append(
                df_([(100 + i, f"w{i}")], f"p{i}").coalesce(1), "r"
            )
        except Exception as e:  # noqa: BLE001 - recorded for the check
            errors.append(e)

    store.write_append(df_([(0, "base")], "z").coalesce(1), "r")
    threads = [threading.Thread(target=appender, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    checks["race_appends_clean"] = not errors
    checks["race_append_rows"] = store.read("r").count()  # 5
    checks["race_versions"] = store.latest_version("r")  # 5

    # overlapping DML race: exactly one of two concurrent deletes over
    # the same rows commits; the loser aborts with ConcurrentCommitError
    outcomes: list[str] = []

    def deleter(pred):
        try:
            store.delete_where("r", [pred])
            outcomes.append("ok")
        except ConcurrentCommitError:
            outcomes.append("abort")

    t1 = threading.Thread(target=deleter, args=(("id", "<", 200),))
    t2 = threading.Thread(target=deleter, args=(("id", "<=", 103),))
    t1.start(); t2.start(); t1.join(); t2.join()
    checks["race_delete_outcomes"] = sorted(outcomes)  # at least one ok
    checks["race_delete_empty"] = store.read("r").count() == 0

    # vacuum vs in-flight writer: a staged-but-unpublished checkpoint
    # sidecar above the latest version must survive vacuum's sidecar GC
    d = store._commits_dir("t")
    latest = store.latest_version("t")
    inflight = f"{latest + 1:020d}.deadbeef.checkpoint.parquet"
    store.io.write_bytes(
        os.path.join(d, inflight),
        mf.entries_to_parquet_bytes(
            [{"path": "d-x", "buckets": None, "files": []}]
        ),
    )
    store.vacuum("t", keep_commits=1)
    checks["vacuum_keeps_inflight"] = inflight in store.io.list_names(d)
    dead = f"{0:020d}.00000000.checkpoint.parquet"
    store.io.write_bytes(
        os.path.join(d, dead),
        mf.entries_to_parquet_bytes(
            [{"path": "d-y", "buckets": None, "files": []}]
        ),
    )
    store.vacuum("t", keep_commits=1)
    checks["vacuum_gcs_dead"] = dead not in store.io.list_names(d)
    checks["post_vacuum_match"] = rows_(store.read("t")) == exp_all

    print(json.dumps(checks), flush=True)
    spark.stop()
    srv.stop()


if __name__ == "__main__":
    main(sys.argv[1])
