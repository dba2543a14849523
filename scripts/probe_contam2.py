#!/usr/bin/env python
"""Per-task-work variants of the contamination pair build, noop-timed.
Usage: SPARK_GRAFT_SF_DIR=/tmp/spark_graft_sf1 python scripts/probe_contam2.py"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/spark_graft_sf1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import functions as F

    from pyairbyte_spark import get_spark
    from pyairbyte_spark.operators import text
    from pyairbyte_spark.queries import t

    spark = get_spark(
        "probe-contam2", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = t(spark, SF_DIR, "documents").select("doc_id", "text")

    # v0: current — explode shingle strings, md5-prefix hash after
    sh = F.conv(F.substring(F.md5(F.col("s")), 1, 15), 16, 10).cast("bigint")
    v0 = docs.select(
        "doc_id", F.explode(text.ngrams_expr("text", 5)).alias("s")
    ).select("doc_id", sh.alias("sh"))

    # v_tok: tokens only (explode tokens, no shingle build) — floor
    v_tok = docs.select("doc_id", F.explode(text.tokens_expr("text")).alias("s"))

    # v_gram: shingle strings exploded, NO hash
    v_gram = docs.select(
        "doc_id", F.explode(text.ngrams_expr("text", 5)).alias("s")
    )

    # v1: md5 inside the transform (pre-explode) — longs explode
    toks = text.tokens_expr("text")
    m = F.size(toks) - F.lit(4)
    grams1 = F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.conv(
            F.substring(F.md5(F.concat_ws(" ", F.slice(toks, i, 5))), 1, 15),
            16,
            10,
        ).cast("bigint"),
    )
    v1 = docs.select(
        "doc_id",
        F.explode(
            F.when(m >= 1, grams1).otherwise(F.array().cast("array<bigint>"))
        ).alias("sh"),
    )

    # v2: token pre-hash + xxhash64 of the 5-long slice (no strings)
    toksh = F.transform(toks, lambda tk: F.xxhash64(tk))
    grams2 = F.transform(
        F.sequence(F.lit(1), m), lambda i: F.xxhash64(F.slice(toksh, i, 5))
    )
    v2 = docs.select(
        "doc_id",
        F.explode(
            F.when(m >= 1, grams2).otherwise(F.array().cast("array<bigint>"))
        ).alias("sh"),
    )

    # v2b: xxhash64 of the raw 5-token string slice (no concat, no md5)
    grams2b = F.transform(
        F.sequence(F.lit(1), m), lambda i: F.xxhash64(F.slice(toks, i, 5))
    )
    v2b = docs.select(
        "doc_id",
        F.explode(
            F.when(m >= 1, grams2b).otherwise(F.array().cast("array<bigint>"))
        ).alias("sh"),
    )

    # v3: explode strings, xxhash64 after (md5->xxhash only)
    v3 = docs.select(
        "doc_id", F.explode(text.ngrams_expr("text", 5)).alias("s")
    ).select("doc_id", F.xxhash64("s").alias("sh"))

    # v4: try_element_at x5 instead of slice() (the dedup.shingles_df
    # shape), md5-prefix hash after explode — byte-identical output to v0
    grams4 = F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(toks, i + j) for j in range(5)]
        ),
    )
    v4 = docs.select(
        "doc_id",
        F.explode(
            F.when(m >= 1, grams4).otherwise(F.array().cast("array<string>"))
        ).alias("s"),
    ).select("doc_id", sh.alias("sh"))

    # v5: selectExpr parsed variant of v4 (rule out py4j noise)
    v5 = docs.selectExpr(
        "doc_id",
        "explode(CASE WHEN size(split(trim(regexp_replace(lower(text),"
        " '\\\\s+', ' ')), ' ')) - 4 >= 1 THEN transform(sequence(1,"
        " size(split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' '))"
        " - 4), i -> concat_ws(' ', try_element_at(split(trim("
        "regexp_replace(lower(text), '\\\\s+', ' ')), ' '), i),"
        " try_element_at(split(trim(regexp_replace(lower(text), '\\\\s+',"
        " ' ')), ' '), i+1), try_element_at(split(trim(regexp_replace("
        "lower(text), '\\\\s+', ' ')), ' '), i+2), try_element_at(split("
        "trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' '), i+3),"
        " try_element_at(split(trim(regexp_replace(lower(text), '\\\\s+',"
        " ' ')), ' '), i+4))) ELSE array() END) AS s",
    ).select("doc_id", sh.alias("sh"))

    # v6: tokens projected to a COLUMN first (computed once per row),
    # then the same slice+concat transform — identical output to v0
    tcol = F.col("__toks")
    m6 = F.size(tcol) - F.lit(4)
    grams6 = F.transform(
        F.sequence(F.lit(1), m6),
        lambda i: F.concat_ws(" ", F.slice(tcol, i, 5)),
    )
    v6 = (
        docs.select("doc_id", text.tokens_expr("text").alias("__toks"))
        .select(
            "doc_id",
            F.explode(
                F.when(m6 >= 1, grams6).otherwise(
                    F.array().cast("array<string>")
                )
            ).alias("s"),
        )
        .select("doc_id", sh.alias("sh"))
    )

    # v6b: projected column + try_element_at x5
    grams6b = F.transform(
        F.sequence(F.lit(1), m6),
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(tcol, i + j) for j in range(5)]
        ),
    )
    v6b = (
        docs.select("doc_id", text.tokens_expr("text").alias("__toks"))
        .select(
            "doc_id",
            F.explode(
                F.when(m6 >= 1, grams6b).otherwise(
                    F.array().cast("array<string>")
                )
            ).alias("s"),
        )
        .select("doc_id", sh.alias("sh"))
    )

    for label, df in [
        ("v_tok tokens only", v_tok),
        ("v_gram strings no hash", v_gram),
        ("v0 current md5 post", v0),
        ("v4 try_element_at x5", v4),
        ("v6 proj col + slice", v6),
        ("v6b proj col + elem_at", v6b),
    ]:
        xs = []
        for _ in range(2):
            t0 = time.monotonic()
            spark.sparkContext.setJobDescription(label)
            noop(df)
            xs.append(time.monotonic() - t0)
        print(f"{label:26s} {' '.join(f'{x:.2f}' for x in xs)}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
