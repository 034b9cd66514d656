"""Text analysis: language id, quality scoring, token counts, fingerprints.

All JVM-side built-ins (no Python in the hot path), and every function is
expressible in ANSI SQL so the DuckDB oracle can verify values exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logminer_kafka_connect_spark.operators.textops.dedup import shingles_expr, words_expr

# tiny marker-word lists for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens, regex (BPE-ish) tokens, char counts, avg word len."""
    w = words_expr(text_col)
    return df.select(
        F.col(id_col),
        F.size(w).alias("n_ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(TOKEN_PATTERN)).alias("n_bpe_tokens"),
        F.length(text_col).alias("n_chars"),
        F.round(
            F.aggregate(w, F.lit(0.0), lambda acc, x: acc + F.length(x)) / F.size(w), 4
        ).alias("avg_word_len"),
    )


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: score = hits per language; prediction
    = argmax (ties broken by language code order)."""
    w = F.col("__w")
    scores = {
        lang: F.size(F.filter(w, lambda x: x.isin(markers))).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    }
    scored = df.select(F.col(id_col), words_expr(text_col).alias("__w")).select(
        F.col(id_col), *scores.values()
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_MARKERS])
    pred = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(
            (best > 0) & (F.col(f"score_{lang}") == best), F.lit(lang)
        ).otherwise(pred)
    return scored.select(
        id_col, *[f"score_{lang}" for lang in LANG_MARKERS], pred.alias("pred_lang")
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length / stopword-ratio / mean-word-length quality heuristic
    (Gopher/C4-style filters, simplified): score in [0,1]."""
    w = words_expr(text_col)
    n = F.size(w)
    stop_hits = F.size(F.filter(w, lambda x: x.isin(STOPWORDS)))
    stop_ratio = stop_hits / n
    awl = F.aggregate(w, F.lit(0.0), lambda acc, x: acc + F.length(x)) / n
    len_ok = F.when((n >= 10) & (n <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    awl_ok = F.when((awl >= 2.0) & (awl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    score = F.round((len_ok + awl_ok + F.least(stop_ratio * F.lit(5.0), F.lit(1.0))) / 3.0, 6)
    return df.select(
        F.col(id_col),
        n.alias("n_words"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(awl, 6).alias("avg_word_len"),
        score.alias("quality"),
    )


def doc_fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_k: int = 5
) -> DataFrame:
    """Winnowing-style fingerprint: min md5 over word 5-gram shingles —
    stable under small edits outside the minimal shingle."""
    sh = shingles_expr(text_col, shingle_k)
    fp = F.array_min(F.transform(sh, lambda s: F.md5(s)))
    return df.select(F.col(id_col), fp.alias("fingerprint"))
