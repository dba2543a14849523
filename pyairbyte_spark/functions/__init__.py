"""Curated scalar-expression namespace (the engine's `F`-style surface).

Everything here is a JVM-side Column expression (codegen'd, no Python
in the hot path) unless noted. These are the building blocks behind
the operators — exposed in one namespace the way ``pyspark.sql
.functions`` is, covering SURVEY §2.8's scalar-function inventory plus
the training-data expression library:

    from pyairbyte_spark import functions as PF
    df.select(PF.token_count_expr("text"), PF.uuid7_expr())

Implementations live with their operator families; this module is the
stable import surface.
"""

from pyairbyte_spark.documents import title_case_expr
from pyairbyte_spark.hashing import one_way_hash, sha256_expr
from pyairbyte_spark.operators.similarity import (
    cosine_expr,
    dot_expr,
    norm_expr,
    sign_bucket_expr,
)
from pyairbyte_spark.operators.text import (
    bpe_ish_token_count_expr,
    fingerprint_md5_expr,
    fingerprint_rolling_expr,
    langid_expr,
    normalize_text_expr,
    punct_ratio_expr,
    quality_score_expr,
    stopword_ratio_expr,
    token_count_expr,
    tokens_expr,
)
from pyairbyte_spark.records import uuid7_expr

__all__ = [
    "bpe_ish_token_count_expr",
    "cosine_expr",
    "dot_expr",
    "fingerprint_md5_expr",
    "fingerprint_rolling_expr",
    "langid_expr",
    "norm_expr",
    "normalize_text_expr",
    "one_way_hash",
    "punct_ratio_expr",
    "quality_score_expr",
    "sha256_expr",
    "sign_bucket_expr",
    "stopword_ratio_expr",
    "title_case_expr",
    "token_count_expr",
    "tokens_expr",
    "uuid7_expr",
]
