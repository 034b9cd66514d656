"""Text analysis: language id, quality scoring, token counts, fingerprints.

All JVM-side built-ins (no Python in the hot path), and every function is
expressible in ANSI SQL so the DuckDB oracle can verify values exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


# PII-ish patterns, ordered: specific shapes first so the generic digit-run
# rule cannot eat an IP/phone before its own rule sees it. Every pattern is
# RE2-compatible (no backrefs/lookaround) so Spark's Java regex and the
# DuckDB oracle's RE2 agree on every match.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9 ()-]{7,}[0-9]", "<PHONE>"),
    ("number", r"[0-9]+", "<NUM>"),
]


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Rule-based PII redaction (the C4/RefinedWeb cleanup step): each
    pattern is counted before substitution, then replaced left-to-right in
    PII_PATTERNS order. Pure ``regexp_count``/``regexp_replace`` chains —
    JVM-side, codegen'd, shuffle-free; at 100 TB this is a narrow map over
    the scan with the text column pruned straight out of parquet."""
    redacted = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(
            F.regexp_count(redacted, F.lit(pat)).alias(f"n_{name}")
        )
        redacted = F.regexp_replace(redacted, pat, token)
    return df.select(F.col(id_col), *counts, redacted.alias("redacted"))


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-unigram-LM score (the CCNet/CCMatrix "perplexity bucket"
    signal, reduced to unigrams so it needs no external model): two
    aggregations over one exploded word stream — global word frequencies,
    then per-doc mean log10 P(word). The frequency table is vocabulary-
    sized (small even at 100 TB corpora — Heaps' law), so the second pass
    is a broadcast hash join; the only full shuffle is the (word) count."""
    words = df.select(F.col(id_col), F.explode(words_expr(text_col)).alias("word"))
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("n"))
    logp = freq.crossJoin(F.broadcast(total)).select(
        "word", F.log10(F.col("c") / F.col("n")).alias("logp")
    )
    return (
        words.join(F.broadcast(logp), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.round(F.avg("logp"), 4).alias("mean_logp"),
        )
    )


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL form for dedup keys (the crawl-frontier normalizer):
    lowercase scheme+host, strip a default port, drop the fragment, drop
    known tracking params (utm_*, fbclid, gclid), sort surviving query
    params, and strip a trailing slash on the path. Pure built-ins
    (regexp + split/array ops) — codegen, shuffle-free, and every step
    has an exact DuckDB twin for the oracle."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"#.*$", "")                       # fragment
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))
    host = F.regexp_replace(hostport, r":(80|443)$", "")       # default ports
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)", 1)
    path = F.regexp_replace(rest, r"/$", "")                   # trailing slash
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.rlike(r"^(utm_[A-Za-z0-9_]*|fbclid|gclid)="),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )
