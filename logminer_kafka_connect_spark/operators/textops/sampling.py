"""Deterministic sampling, dataset splitting, and repetition signals.

Training-data curation primitives the reference connector has no
counterpart for (beyond-reference suite):

- **hash sampling / splitting**: membership decided by a salted ``md5``
  of the row's key — deterministic across runs, engines, cluster sizes,
  and partitionings (unlike ``df.sample``, whose output depends on
  partition layout). A pure narrow filter/projection: at 100 TB this is
  a scan with a predicate — zero shuffles, and Catalyst prunes unsampled
  columns into the parquet scan.
- **stratified sampling**: per-stratum rates as one CASE expression over
  the same hash — still shuffle-free.
- **repetition signals** (Gopher-style): duplicate-line/word fractions
  (per-row array expressions, shuffle-free) and top-n-gram coverage
  (explode -> (doc, gram) count -> per-doc max/sum: one partial-agg
  shuffle keyed on (doc_id, gram), the scalable shape for long docs).

All hashes are md5 with explicit integer thresholds so a DuckDB oracle
reproduces every decision bit-exactly (same trick as the MinHash suite).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logminer_kafka_connect_spark.operators.textops import ensure_compute_parallelism
from logminer_kafka_connect_spark.operators.textops.dedup import words_expr

_HASH_SPACE = 1 << 32  # first 8 md5 hex chars -> uniform in [0, 2^32)


def _hash_u32(key: Column, salt: str) -> Column:
    """Salted uniform hash in [0, 2^32): first 8 hex chars of
    ``md5(key || ':' || salt)`` — reproducible in any engine with md5."""
    h = F.md5(F.concat(key.cast("string"), F.lit(":" + salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows, decided per-key.

    Rows with equal keys are kept or dropped together (so re-crawls /
    revisions of one document never straddle the cut), and adding data
    never flips prior decisions — the properties ``df.sample`` lacks.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return df.filter(_hash_u32(F.col(key_col), salt) < int(rate * _HASH_SPACE))


def assign_split(
    df: DataFrame,
    weights: list[tuple[str, float]] | None = None,
    key_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Label every row with a deterministic train/val/test split.

    ``weights`` is an ordered ``[(name, weight), ...]`` (normalized
    internally; default 98/1/1). The same (key, salt) always lands in the
    same split, on any cluster, at any scale.
    """
    weights = weights or [("train", 0.98), ("val", 0.01), ("test", 0.01)]
    total = sum(w for _, w in weights)
    if total <= 0 or any(w < 0 for _, w in weights):
        raise ValueError(f"weights must be non-negative with a positive sum: {weights}")
    h = _hash_u32(F.col(key_col), salt)
    expr, acc = None, 0.0
    for name, w in weights[:-1]:
        acc += w / total
        cond = h < int(acc * _HASH_SPACE)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = weights[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    default_rate: float = 0.0,
    key_col: str = "doc_id",
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. keep 100% of low-resource
    languages, 10% of English). Strata missing from ``rates`` get
    ``default_rate``. One CASE expression — still a narrow plan."""
    for k, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0,1], got {r}")
    h = _hash_u32(F.col(key_col), salt)
    thresh = F.lit(int(default_rate * _HASH_SPACE))
    for value, r in sorted(rates.items()):
        thresh = F.when(F.col(strata_col) == value, int(r * _HASH_SPACE)).otherwise(thresh)
    return df.filter(h < thresh)


def _ngrams_expr(text_col: str, n: int) -> Column:
    """All word n-gram occurrences (NOT distinct — occurrence counts are
    the point; contrast ``dedup.shingles_expr``)."""
    w = words_expr(text_col)
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", w)))


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Gopher-style repetition signals per document:

    - ``dup_line_frac`` / ``dup_word_frac``: 1 - distinct/total — high
      values mean boilerplate or degenerate repetition.
    - ``top_{n}gram_frac``: occurrences of the most frequent word n-gram
      over all n-gram occurrences — high values mean loops/templates.
    """
    lines = F.split(F.col(text_col), "\n")
    words = words_expr(text_col)
    # repetition arrays + n-gram explodes are per-row heavy: guard against
    # a single-split input serializing them (no-op on well-split inputs);
    # the hash-sampling/split operators above stay narrow by design
    df = ensure_compute_parallelism(df)
    base = df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.round(1.0 - F.size(F.array_distinct(lines)) / F.size(lines), 6).alias(
            "dup_line_frac"
        ),
        F.round(1.0 - F.size(F.array_distinct(words)) / F.size(words), 6).alias(
            "dup_word_frac"
        ),
    )
    for n in ngram_ns:
        grams = df.select(
            F.col(id_col), F.explode(_ngrams_expr(text_col, n)).alias("gram")
        )
        per_gram = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
        frac = per_gram.groupBy(id_col).agg(
            F.round(F.max("c") / F.sum("c"), 6).alias(f"top_{n}gram_frac")
        )
        base = base.join(frac, id_col)
    return base


def weighted_sample_per_stratum(
    df: DataFrame,
    n: int,
    weight_col: str,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-Res): each row draws key = ln(u)/w from a salted-hash
    uniform u and its weight w; the n LARGEST keys per stratum are an
    exact weighted sample (u^(1/w) order, taken in log space). Unlike a
    weighted ``df.sample`` there is no RNG state: the same (key, salt)
    draws the same u on any engine, cluster size, or partition layout,
    and adding rows never flips earlier draws — the reproducibility
    contract corpus curation needs. Rows with non-positive weight are
    excluded (the estimator is undefined there).

    100 TB shape: one window shuffle keyed on the stratum; at extreme
    per-stratum cardinality swap the window for a size-n per-partition
    heap (``mapInPandas``) + merge, same keys."""
    from pyspark.sql.window import Window

    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    h = _hash_u32(F.col(key_col), salt)
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(_HASH_SPACE))
    wkey = F.log(u) / F.col(weight_col).cast("double")
    win = Window.partitionBy(strata_col).orderBy(F.col("_wkey").desc(), F.col(key_col))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_wkey", wkey)
        .withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= n)
        .drop("_wkey", "_rn")
    )
