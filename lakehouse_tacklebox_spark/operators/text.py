"""Text-analysis operators for training-data pipelines.

Language ID (stopword heuristic), quality scoring, token counting, and
document fingerprinting — all as JVM-side column expressions so a 100 TB
corpus pass is scan-bound, not Python-bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword language
# heuristic. Real pipelines would use fastText/CLD3; this is the
# deterministic, dependency-free form with the same dataflow shape.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "que", "de", "los"),
    "zh": ("的", "是", "了", "在", "我"),
}


def tokens_col(text_col: str) -> Column:
    """Whitespace tokens of the lowercased text."""
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def token_count(text_col: str) -> Column:
    """Whitespace token count."""
    return F.size(tokens_col(text_col))


def bpe_ish_token_estimate(text_col: str) -> Column:
    """BPE-style token estimate: word-piece regex splits on word
    boundaries, digits, and punctuation — ~the chars/4 heuristic refined
    by actual boundaries. Deterministic and cheap (one regexp pass)."""
    pieces = F.size(F.split(F.col(text_col), r"(?=[\s\p{Punct}])|(?<=[\s\p{Punct}])"))
    return F.greatest(pieces, F.ceil(F.length(F.col(text_col)) / 4).cast("int"))


def _marker_matcher(markers: tuple[str, ...]):
    """Arity-1 lambda factory (a default arg would change the lambda's
    arity and make Spark pass the element index as the second arg)."""
    arr = F.array(*[F.lit(m) for m in markers])
    return lambda t: F.array_contains(arr, t)


def lang_scores(text_col: str) -> dict[str, Column]:
    """Per-language marker-hit counts over the token array."""
    toks = tokens_col(text_col)
    return {
        lang: F.size(F.filter(toks, _marker_matcher(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def detect_language(text_col: str, default: str = "und") -> Column:
    """argmax over marker-hit counts; ties broken by language code order,
    zero hits → 'und'."""
    scores = lang_scores(text_col)
    pairs = F.array(
        *[F.struct(score.alias("score"), F.lit(lang).alias("lang")) for lang, score in sorted(scores.items())]
    )
    best = F.array_max(pairs)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit(default))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-signal columns: token/char counts, mean token
    length, punctuation & digit ratios, uppercase ratio, stopword ratio.

    These are the classic pre-training corpus filters (Gopher/C4-style
    rules) expressed as vectorizable column ops.
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    n_toks = token_count(text_col)
    punct_chars = n_chars - F.length(F.regexp_replace(text, r"[\p{Punct}]", ""))
    digit_chars = n_chars - F.length(F.regexp_replace(text, r"[0-9]", ""))
    upper_chars = n_chars - F.length(F.regexp_replace(text, r"[A-Z]", ""))
    en_stops = F.size(F.filter(tokens_col(text_col), lambda t: t.isin("the", "and", "of", "to", "in", "a", "is")))
    return (
        df.withColumn("n_tokens", n_toks)
        .withColumn("mean_token_len", F.round(n_chars / F.greatest(n_toks, F.lit(1)), 4))
        .withColumn("punct_ratio", F.round(punct_chars / F.greatest(n_chars, F.lit(1)), 4))
        .withColumn("digit_ratio", F.round(digit_chars / F.greatest(n_chars, F.lit(1)), 4))
        .withColumn("upper_ratio", F.round(upper_chars / F.greatest(n_chars, F.lit(1)), 4))
        .withColumn("stopword_ratio", F.round(en_stops / F.greatest(n_toks, F.lit(1)), 4))
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite 0-1 quality score from the feature columns."""
    feats = quality_features(df, text_col)
    score = (
        F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), 0.4).otherwise(0.0)
        + F.when((F.col("mean_token_len") >= 3) & (F.col("mean_token_len") <= 12), 0.3).otherwise(0.0)
        + F.when(F.col("punct_ratio") <= 0.2, 0.15).otherwise(0.0)
        + F.when(F.col("digit_ratio") <= 0.2, 0.15).otherwise(0.0)
    )
    return feats.withColumn("quality_score", F.round(score, 4))


def rolling_fingerprint(text_col: str, prefix_tokens: int = 16) -> Column:
    """Document fingerprint: 64-bit rolling-style hash of the normalized
    leading token window (cheap near-identity for clustering)."""
    head = F.concat_ws(" ", F.slice(tokens_col(text_col), 1, prefix_tokens))
    return F.xxhash64(head)
