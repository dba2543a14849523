#!/usr/bin/env python
"""The 100 TB training-data story, end to end, on the local testdata.

documents.parquet -> exact dedup -> language filter -> quality floor ->
near-dup pruning (MinHash LSH) -> token counting -> token-budget shards
written back as parquet. Every stage is a DataFrame plan; Catalyst
fuses the scan/filter stages into single jobs.

Run: python examples/training_data_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyairbyte_spark import get_spark
from pyairbyte_spark.operators import dedup, text
from pyairbyte_spark.operators.curation import pack_token_bins


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp("shards")
    spark = get_spark("training-data-pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. exact dedup (deterministic keeper)
    kept = dedup.exact_dedup(docs, ["text"], id_col="doc_id")

    # 2. language + quality filters (pure expressions, fused by Catalyst)
    filtered = kept.filter(
        (text.langid_expr("text") == "en")
        & (text.stopword_ratio_expr("text") >= 0.05)
    )

    # 3. near-dup pruning: drop the higher-id side of LSH candidates
    cand = dedup.minhash_lsh_candidates(filtered, "text", "doc_id")
    dupes = cand.select(F.col("id_b").alias("doc_id")).distinct()
    pruned = filtered.join(dupes, "doc_id", "left_anti")

    # 3b. semantic dedup over the embedding table (SemDeDup): k-means
    # clusters, within-cluster cosine pruning — catches paraphrase-level
    # duplicates the shingle/LSH passes can't see. vec_id == doc_id in
    # the testdata corpus.
    from pyairbyte_spark.operators.similarity import quantize_int8, semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sem = semantic_dedup(emb, n_clusters=8, iters=1, threshold=0.45)
    sem_dupes = sem.filter("is_duplicate").select(
        F.col("vec_id").alias("doc_id")
    )
    pruned = pruned.join(sem_dupes, "doc_id", "left_anti")

    # 3c. quantize the surviving embeddings for the feature store
    # (map-only int8 rewrite, 4x smaller scans for every later pass)
    quantize_int8(emb.join(pruned.select("doc_id"), emb.vec_id == F.col("doc_id"), "left_semi"))

    # 4. token counting + packing into ~2000-token shards
    tok = pruned.select(
        "doc_id", "text", text.token_count_expr("text").cast("long").alias("n_tokens")
    )
    shards = pack_token_bins(tok, token_col="n_tokens", budget=2000, id_col="doc_id")

    shards.write.mode("overwrite").partitionBy("bin_id").parquet(out_dir)
    out = spark.read.parquet(out_dir)
    n_shards = out.select("bin_id").distinct().count()
    print(
        f"{n0} docs -> {out.count()} curated docs in {n_shards} shards -> {out_dir}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
