"""Text-analysis operators: tokenization, quality, language-ID,
fingerprinting.

All pure ``pyspark.sql.functions`` expression trees — they stay inside
whole-stage codegen and scale linearly with no shuffle (per-row maps).
Every operator has an equivalent ANSI-SQL rendering for the DuckDB
oracle (see ``pyairbyte_spark.queries``), so numeric definitions below
deliberately use engine-portable primitives (md5, regexp, fold).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small multilingual stopword/marker sets (public common words).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "zh": ["的", "是", "不", "了", "在", "人", "有", "我"],
}

EN_STOPWORDS = LANG_MARKERS["en"] + ["it", "for", "on", "with", "as", "at", "by"]

# Polynomial rolling-hash parameters (portable: BIGINT-safe in both
# Spark and DuckDB — accumulator stays < 131 * 1e9 + 255 < 2^63).
_FP_BASE = 131
_FP_MOD = 1_000_000_007


def tokens_expr(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count_expr(col: Column | str) -> Column:
    return F.size(tokens_expr(col))


def bpe_ish_token_count_expr(col: Column | str) -> Column:
    """BPE-ish subword proxy: word-chunks + digits + punctuation marks,
    the regex family BPE pre-tokenizers use."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def punct_ratio_expr(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return n_punct / F.greatest(F.length(c), F.lit(1))


def stopword_ratio_expr(col: Column | str, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or EN_STOPWORDS
    toks = tokens_expr(col)
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(sw)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score_expr(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation
    + moderate stopword density (doc-quality filters à la C4/Gopher,
    public recipes)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    len_score = F.when(n < 50, n / F.lit(50.0)).when(n > 5000, F.lit(0.5)).otherwise(F.lit(1.0))
    punct_pen = F.least(punct_ratio_expr(c) * 4, F.lit(1.0))
    sw = stopword_ratio_expr(c)
    sw_score = F.when(sw > 0.6, F.lit(0.5)).otherwise(F.lit(1.0))
    return F.round(len_score * (1 - punct_pen * 0.5) * sw_score, 6)


def langid_expr(col: Column | str) -> Column:
    """Marker-word language ID: argmax over per-language marker hits,
    deterministic tie-break by language code order."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.transform(tokens_expr(c), lambda t: F.lower(t))
    scores = [
        F.struct(
            F.size(F.filter(toks, lambda t: t.isin(words))).alias("hits"),
            F.lit(len(LANG_MARKERS) - i).alias("prio"),  # earlier lang wins ties
            F.lit(lang).alias("lang"),
        )
        for i, (lang, words) in enumerate(LANG_MARKERS.items())
    ]
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("unknown"))


def normalize_text_expr(col: Column | str) -> Column:
    """Lowercase + collapse whitespace — canonical form for fingerprints."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint_md5_expr(col: Column | str) -> Column:
    """Content fingerprint = md5 of normalized text."""
    return F.md5(normalize_text_expr(col))


def fingerprint_rolling_expr(col: Column | str) -> Column:
    """Polynomial rolling hash over the normalized text's characters:
    ``h = fold(chars, 0, (acc, ch) -> (acc*131 + ascii(ch)) mod 1e9+7)``.

    A JVM-side fold (``F.aggregate``) — linear, no shuffle, no UDF.
    """
    chars = F.regexp_extract_all(normalize_text_expr(col), F.lit("."), 0)
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * _FP_BASE + F.ascii(ch)) % _FP_MOD,
    )


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text-analysis projection over a documents table."""
    return df.select(
        "*",
        token_count_expr(text_col).alias("n_tokens"),
        bpe_ish_token_count_expr(text_col).alias("n_subword_tokens"),
        F.round(punct_ratio_expr(text_col), 6).alias("punct_ratio"),
        F.round(stopword_ratio_expr(text_col), 6).alias("stopword_ratio"),
        quality_score_expr(text_col).alias("quality_score"),
        langid_expr(text_col).alias("lang_pred"),
        fingerprint_md5_expr(text_col).alias("fingerprint"),
        fingerprint_rolling_expr(text_col).alias("rolling_fp"),
    )
