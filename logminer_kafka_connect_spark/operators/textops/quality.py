"""Text analysis: language id, quality scoring, token counts, fingerprints.

All JVM-side built-ins (no Python in the hot path), and every function is
expressible in ANSI SQL so the DuckDB oracle can verify values exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logminer_kafka_connect_spark.operators.textops import ensure_compute_parallelism
from pyspark.sql.window import Window

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


def _quality_cols(text_col: str) -> dict[str, Column]:
    """The quality-heuristic expressions, reusable inline (curate_corpus
    composes them without a join back on id)."""
    w = words_expr(text_col)
    n = F.size(w)
    stop_hits = F.size(F.filter(w, lambda x: x.isin(STOPWORDS)))
    stop_ratio = stop_hits / n
    awl = F.aggregate(w, F.lit(0.0), lambda acc, x: acc + F.length(x)) / n
    len_ok = F.when((n >= 10) & (n <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    awl_ok = F.when((awl >= 2.0) & (awl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    score = F.round((len_ok + awl_ok + F.least(stop_ratio * F.lit(5.0), F.lit(1.0))) / 3.0, 6)
    return {
        "n_words": n,
        "stopword_ratio": F.round(stop_ratio, 6),
        "avg_word_len": F.round(awl, 6),
        "quality": score,
    }


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length / stopword-ratio / mean-word-length quality heuristic
    (Gopher/C4-style filters, simplified): score in [0,1]."""
    cols = _quality_cols(text_col)
    return df.select(F.col(id_col), *[c.alias(n) for n, c in cols.items()])


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


def tfidf_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
    min_word_len: int = 3,
) -> DataFrame:
    """Per-document top-k TF-IDF keywords (the classic corpus-level
    keyword extractor).

    Shape at 100 TB: one (doc, word) partial-agg shuffle for tf, one
    (word) partial-agg shuffle for document frequency — both map-side
    combined — and the df table is vocabulary-sized (Heaps' law), so it
    comes back as a broadcast hash join; the final per-doc top-k is a
    ranking window over rows already grouped by doc. The corpus size N
    rides along as a broadcast 1-row aggregate — no driver collect.

    Ranking is on the 6-dp ROUNDED score (ties broken by word) so the
    order is engine-stable: tf * ln(N/df) is transcendental and two
    libms may disagree in the last ulp, but never at 6 decimals.
    """
    tok = F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")
    words = (
        df.select(F.col(id_col), F.explode(tok).alias("word"))
        .filter(F.length("word") >= min_word_len)
    )
    tf = words.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "word")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "word",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias(
                "tfidf"
            ),
        )
    )
    win = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("word").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= top_k)
        .withColumn("rank", F.col("rank").cast("long"))
    )


def curate_corpus(
    df: DataFrame,
    langs: tuple[str, ...] = ("en", "de"),
    min_quality: float = 0.5,
    weights: list[tuple[str, float]] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """End-to-end corpus curation — the composition a training-data run
    actually executes: language filter -> quality gate -> exact-dup
    keep-min-id -> deterministic split assignment.

    One narrow scan does the lang filter and the quality expressions
    (cheap predicate first so the word-array math runs on survivors
    only); the ONLY shuffle is the md5(text) dedup window; the split is
    a pure projection (sampling.assign_split — partition-layout
    independent). At 100 TB: scan-dominated, single Exchange.
    """
    from logminer_kafka_connect_spark.operators.textops.sampling import assign_split

    q = _quality_cols(text_col)
    kept = (
        df.filter(F.col(lang_col).isin(list(langs)))
        .select(F.col(id_col), F.col(lang_col), q["quality"].alias("quality"),
                F.md5(F.col(text_col)).alias("__th"))
        .filter(F.col("quality") >= min_quality)
    )
    keeper = F.min(id_col).over(Window.partitionBy("__th"))
    deduped = (
        kept.withColumn("__keeper", keeper)
        .filter(F.col(id_col) == F.col("__keeper"))
        .drop("__th", "__keeper")
    )
    return assign_split(deduped, weights=weights, key_col=id_col)


def boilerplate_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_doc_frac: float = 0.01,
) -> DataFrame:
    """Corpus-wide boilerplate span detection (the C4 'repeated spans'
    cleaning rule, word-gram form): a word k-gram occurring in at least
    ``ceil(min_doc_frac * n_docs)`` DISTINCT documents is boilerplate
    (navigation chrome, cookie banners, license footers). Returns
    (gram, n_docs, example_doc) for the downstream strip/score pass.

    100 TB shape: shingles are distinct-per-doc arrays built by one
    narrow projection (``shingles_expr``), so the single shuffle is the
    (gram) count agg with map-side partials; the doc-count threshold is
    one scalar aggregate. No joins, no Python. Docs shorter than k words
    carry no k-gram and are excluded on both engines."""
    n_docs = df.count()  # bounded scalar aggregate (threshold input)
    import math

    min_docs = max(2, math.ceil(min_doc_frac * n_docs))
    w = words_expr(text_col)
    grams = ensure_compute_parallelism(df).filter(F.size(w) >= k).select(
        F.col(id_col), F.explode(shingles_expr(text_col, k)).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min(id_col).alias("example_doc"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def word_entropy(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document unigram (word) Shannon entropy in bits — the
    low-diversity/spam signal complementing the Gopher repetition stats:
    H = log2(n) - sum(c * log2(c)) / n over per-word counts c. Computed
    with that identity so ONE (doc, word) count agg plus ONE per-doc agg
    suffice (no window over totals); both shuffles are keyed on the doc
    id, and AQE coalesces them at scale. Rounded to 4 decimals on both
    engines to absorb float summation order."""
    counts = (
        ensure_compute_parallelism(df)
        .select(F.col(id_col), F.explode(words_expr(text_col)).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c")
    s = F.sum(F.col("c") * F.log2("c"))
    return counts.groupBy(id_col).agg(
        n.cast("long").alias("n_words"),
        F.round(F.log2(n) - s / n, 4).alias("entropy"),
    )


#: fixed logistic weights of the quality gate — deterministic stand-in for
#: a trained fastText/LR quality classifier (DCLM / FineWeb-edu style);
#: swap in learned weights without touching the plan
GATE_WEIGHTS = {
    "bias": -3.0,
    "log_words": 0.35,
    "stopword_ratio": 2.0,
    "avg_word_len": 0.15,
    "uniq_ratio": 1.5,
}


def classifier_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Quality-classifier INFERENCE as a pure Catalyst expression — the
    model-gating step of a curation pipeline (DCLM, FineWeb-edu) with
    the linear model inlined into the scan: features (log word count,
    stopword ratio, mean word length, unique-word ratio) and the
    sigmoid all run JVM-side in whole-stage codegen, so at 100 TB the
    gate costs one narrow pass with zero Python and zero shuffle.
    Returns (id, score, keep)."""
    wt = dict(GATE_WEIGHTS, **(weights or {}))
    w = words_expr(text_col)
    n = F.size(w)
    stop_ratio = F.size(F.filter(w, lambda x: x.isin(STOPWORDS))) / n
    awl = F.aggregate(w, F.lit(0.0), lambda acc, x: acc + F.length(x)) / n
    uniq = F.size(F.array_distinct(w)) / n
    z = (
        F.lit(wt["bias"])
        + F.lit(wt["log_words"]) * F.log(F.lit(1.0) + n)
        + F.lit(wt["stopword_ratio"]) * stop_ratio
        + F.lit(wt["avg_word_len"]) * awl
        + F.lit(wt["uniq_ratio"]) * uniq
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return df.select(
        F.col(id_col),
        score.alias("score"),
        (score >= threshold).alias("keep"),
    )
