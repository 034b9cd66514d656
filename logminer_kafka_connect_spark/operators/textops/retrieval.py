"""BM25 ranked retrieval over the corpus (Robertson & Spärck Jones;
Okapi BM25) — the lexical-search complement of the embedding ANN suite
and the TF-IDF keyword extractor.

Every term is a relational quantity, so the whole scorer is JVM-side SQL
(no Python) and fully DuckDB-oracle-expressible:

- document length + average length: one narrow projection + one scalar
  aggregate;
- term frequency: explode(words) -> count per (doc, term), ONE shuffle
  keyed on the doc (map-side combined);
- document frequency per query term: the tf relation filtered to the
  query terms (a broadcast-able tiny set), counted per term;
- score: sum over matched query terms of idf * tf*(k1+1) /
  (tf + k1*(1-b + b*len/avglen)).

100 TB shape: tf is the only corpus-sized shuffle and would be built
once as a standing inverted-index relation (bucketed by term) serving
every query; the per-query work is a semi-join against the query's terms
plus a top-k window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from logminer_kafka_connect_spark.operators.textops.dedup import words_expr


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-terms query by Okapi BM25 with the
    Lucene-style non-negative idf = ln(1 + (N - df + 0.5)/(df + 0.5)).
    Returns (doc_id, score, rank); ties break on the doc id. Scores are
    rounded to 6 decimals (float-summation-order tolerance — the same
    convention as every numeric oracle in this suite)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    n_docs = df.count()  # scalar aggregate (idf + avgdl inputs)
    lens = df.select(F.col(id_col), F.size(words_expr(text_col)).alias("dl"))
    avgdl = lens.agg(F.avg("dl")).collect()[0][0]
    tf = (
        df.select(F.col(id_col), F.explode(words_expr(text_col)).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = tf.groupBy("term").agg(
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.count(F.lit(1)) + 0.5) / (F.count(F.lit(1)) + 0.5)
        ).alias("idf")
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(lens, id_col)
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / float(avgdl))),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    # global top-k as orderBy+limit (TakeOrderedAndProject: per-partition
    # heads merged on the driver, NO single-partition sort shuffle); the
    # unpartitioned rank window then runs over k rows only
    top = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(id_col, "score", "rank")
