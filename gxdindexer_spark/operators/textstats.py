"""Text-analysis operators for a large-scale training-data pipeline:
language ID, quality scoring, token counting, document fingerprinting.

Everything here is built-in `pyspark.sql.functions` (JVM-side,
whole-stage-codegen'd) — no Python in the hot path — and each operator
has an exact DuckDB-SQL oracle twin in __spark_entry__.py. At 100 TB
these are embarrassingly parallel scans: no shuffle at all except the
optional aggregations callers add.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans"],
    "es": ["el", "la", "los", "de", "que", "es", "una", "por"],
}

STOPWORDS_EN = LANG_PROFILES["en"] + ["a", "an", "it", "on", "as", "are"]

# BPE-ish token regex: word pieces, digit runs, or single non-space symbols
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tokens(text: Column) -> Column:
    return F.filter(
        F.split(F.lower(F.coalesce(text, F.lit(""))), "[^a-z0-9]+"),
        lambda x: x != "",
    )


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """whitespace token count + BPE-ish regex token count per doc."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    return df.withColumn(
        "ws_tokens",
        F.size(F.filter(F.split(t, r"\s+"), lambda x: x != "")),
    ).withColumn(
        "bpe_tokens",
        F.size(F.regexp_extract_all(t, F.lit(BPE_RE), 0)),
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristics: length, mean word length,
    stopword ratio, alpha ratio, and a composed 0..1 score."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    stop = F.size(
        F.filter(toks, lambda x: x.isin(STOPWORDS_EN))
    )
    alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    out = (
        df.withColumn("n_tokens", n)
        .withColumn(
            "mean_word_len",
            F.round(
                F.when(n > 0, F.length(F.concat_ws("", toks)) / n).otherwise(0.0), 6
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.round(F.when(n > 0, stop / n).otherwise(0.0), 6),
        )
        .withColumn(
            "alpha_ratio",
            F.round(
                F.when(F.length(t) > 0, alpha / F.length(t)).otherwise(0.0), 6
            ),
        )
    )
    # composed score: in-range length + healthy stopword share + alpha
    return out.withColumn(
        "quality_score",
        F.round(
            (
                F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 10000), 0.4)
                .otherwise(0.0)
                + F.when(F.col("stopword_ratio") >= 0.05, 0.3).otherwise(0.0)
                + F.when(F.col("alpha_ratio") >= 0.5, 0.3).otherwise(0.0)
            ),
            6,
        ),
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID: argmax of per-language hit counts,
    deterministic tiebreak by language code; 'und' when all zero."""
    # tokenize ONCE into a real column: as a bare expression the
    # lower+split+filter would be re-evaluated per language profile
    # (4x per row) — the per-language hit counts then filter the
    # shared array. spread: fan a narrow one-file scan out before the
    # per-row work (functions/partitioning.py)
    from gxdindexer_spark.functions.partitioning import spread

    scored = spread(df).withColumn("_toks", _tokens(F.col(text_col)))
    for lang, words in sorted(LANG_PROFILES.items()):
        # NB: the lambda must take exactly one arg — a second arg would
        # be bound by Spark to the array index, not our closure.
        pred = (lambda w: (lambda x: x.isin(w)))(words)
        scored = scored.withColumn(
            f"_hits_{lang}", F.size(F.filter(F.col("_toks"), pred))
        )
    langs = sorted(LANG_PROFILES)
    best = F.greatest(*[F.col(f"_hits_{lg}") for lg in langs])
    pred = F.lit("und")
    # reversed so earlier language codes win ties
    for lg in reversed(langs):
        pred = F.when((best > 0) & (F.col(f"_hits_{lg}") == best), lg).otherwise(
            pred
        )
    return scored.withColumn("lang_pred", pred).drop(
        "_toks", *[f"_hits_{lg}" for lg in langs]
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of case/whitespace-normalized text —
    the portable normalization-dedup key (exact dedup modulo spacing)."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " ")
    )
    return df.withColumn("fingerprint", F.md5(norm))
