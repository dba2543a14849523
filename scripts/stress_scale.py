#!/usr/bin/env python
"""Scale-stress harness: replicate sf0.1 N× and run the bucketed paths.

The 10× sweep (SCALE.md) validated linearity; this script pushes the
bucket-keyed operators (LSH, IVF, contamination, exact dedup, SimHash,
packing) to an arbitrary factor — catching bucket-size constants that
only bite past 10× — and stresses the keyed-state streaming operators
with a pathological hot key (one user, 10^5 events) asserting state
stays O(keys), not O(events).

Usage::

    python scripts/stress_scale.py --factor 100 \
        --ops dedup_exact_groups,dedup_minhash_lsh,ann_ivf_topk
    python scripts/stress_scale.py --hotkey 100000

Replicas offset every id and perturb text/embeddings per replica so
near-dup structure stays realistic instead of exploding quadratically
with exact copies.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_OPS = [
    "dedup_exact_groups",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "ann_ivf_topk",
    "ann_brute_force_topk",
    "contamination_check",
    "pack_token_bins_docs",
    "text_tfidf_top_terms",
]


def build_replicated_dir(spark, factor: int, out_dir: str) -> str:
    """Materialize an sf-dir replicated ``factor``× with realistic
    perturbation (ids offset; text suffixed; embeddings jittered)."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    reps = spark.range(factor).withColumnRenamed("id", "rep")

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_docs = docs.count()
    (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(n_docs)).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" rep"), F.col("rep")))
            .alias("text"),
            "lang",
            "source",
            F.col("n_chars"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents.parquet"))
    )

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n_vec = emb.count()
    (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(n_vec)).alias("vec_id"),
            F.expr(
                "transform(embedding, (v, i) -> "
                "v + float(sin(vec_id * 31 + i + rep)) * 0.02F)"
            ).alias("embedding"),
            "label",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "embeddings.parquet"))
    )

    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    n_ev = ev.count()
    n_users = ev.select(F.max("user_id")).first()[0] or 0
    (
        ev.crossJoin(F.broadcast(reps))
        .select(
            (F.col("event_id") + F.col("rep") * F.lit(n_ev)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * F.lit(n_users + 1)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "events.parquet"))
    )

    # relational tables pass through untouched (symlink-equivalent copy
    # by reference: the ops under stress only read the three above, but
    # queries() helpers may probe other tables' footers)
    for tbl in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        src = os.path.join(SF_DIR, f"{tbl}.parquet")
        dst = os.path.join(out_dir, f"{tbl}.parquet")
        if not os.path.exists(dst):
            os.symlink(src, dst)
    return out_dir


def run_ops(spark, sf_dir: str, ops: list[str]) -> dict[str, float]:
    from pyairbyte_spark import queries as q

    registry = q.queries()
    out: dict[str, float] = {}
    for name in ops:
        t0 = time.monotonic()
        n = registry[name](spark, sf_dir).count()
        out[name] = round(time.monotonic() - t0, 2)
        print(f"# {name}: {out[name]}s ({n} rows)", file=sys.stderr)
    return out


def hotkey_stress(spark, n_events: int) -> dict:
    """One user emits n_events; keyed state must stay O(keys)."""
    from pyspark.sql import functions as F

    from pyairbyte_spark.streaming.windowed import (
        match_sequence,
        run_to_memory,
        stream_from_parquet_dir,
        streaming_dedup,
    )

    td = tempfile.mkdtemp(prefix="hotkey-")
    src = os.path.join(td, "events")
    (
        spark.range(n_events)
        .select(
            F.lit(1).alias("user_id"),
            F.element_at(
                F.array(F.lit("view"), F.lit("click"), F.lit("browse")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("event_type"),
            (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(
                secs=F.col("id").cast("double")
            )).alias("ts"),
        )
        .coalesce(4)
        .write.mode("overwrite")
        .parquet(src)
    )
    schema = spark.read.parquet(src).schema
    results = {}

    t0 = time.monotonic()
    stream = stream_from_parquet_dir(spark, src, schema, max_files_per_trigger=2)
    matched = match_sequence(
        stream,
        key_col="user_id",
        event_col="event_type",
        ts_col="ts",
        sequence=["view", "click", "browse"],
    )
    q1 = (
        matched.writeStream.outputMode("update")
        .format("memory")
        .queryName("hot_cep")
        .option("checkpointLocation", os.path.join(td, "ck1"))
        .start()
    )
    q1.processAllAvailable()
    state_rows = max(
        (p["stateOperators"][0]["numRowsTotal"] for p in q1.recentProgress
         if p.get("stateOperators")),
        default=-1,
    )
    q1.stop()
    results["cep"] = {
        "sec": round(time.monotonic() - t0, 2),
        "events": n_events,
        "state_rows": state_rows,
        "matches": spark.table("hot_cep").count(),
    }

    t0 = time.monotonic()
    stream = stream_from_parquet_dir(spark, src, schema, max_files_per_trigger=2)
    deduped = streaming_dedup(stream, digest_cols=["user_id", "event_type"])
    q2 = (
        deduped.writeStream.outputMode("update")
        .format("memory")
        .queryName("hot_dedup")
        .option("checkpointLocation", os.path.join(td, "ck2"))
        .start()
    )
    q2.processAllAvailable()
    state_rows = max(
        (p["stateOperators"][0]["numRowsTotal"] for p in q2.recentProgress
         if p.get("stateOperators")),
        default=-1,
    )
    q2.stop()
    results["dedup"] = {
        "sec": round(time.monotonic() - t0, 2),
        "events": n_events,
        "state_rows": state_rows,
        "survivors": spark.table("hot_dedup").count(),
    }
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=0, help="replication factor")
    ap.add_argument("--ops", default=",".join(DEFAULT_OPS))
    ap.add_argument("--hotkey", type=int, default=0, help="hot-key event count")
    ap.add_argument("--keep", action="store_true", help="keep the replica dir")
    args = ap.parse_args()

    from pyairbyte_spark import get_spark

    spark = get_spark(
        "stress-scale", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    report: dict = {"sf_base": SF_DIR}
    if args.factor:
        td = tempfile.mkdtemp(prefix=f"stress{args.factor}x-")
        t0 = time.monotonic()
        build_replicated_dir(spark, args.factor, td)
        print(f"# replicated {args.factor}x in {time.monotonic()-t0:.1f}s -> {td}",
              file=sys.stderr)
        report["factor"] = args.factor
        report["ops"] = run_ops(spark, td, [o for o in args.ops.split(",") if o])
        if not args.keep:
            import shutil

            shutil.rmtree(td, ignore_errors=True)
    if args.hotkey:
        report["hotkey"] = hotkey_stress(spark, args.hotkey)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
