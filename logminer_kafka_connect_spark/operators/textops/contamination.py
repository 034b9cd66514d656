"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation set.

The standard LLM-corpus hygiene step (GPT-3 appendix C / PaLM-style
13-gram decontamination, shrunk to the shingle size the rest of this
suite uses): any training document sharing at least one distinct word
k-gram with any eval document is contaminated and reported with its
overlap counts.

Scale shape: the eval side of the join is the benchmark suite — tiny by
construction (thousands of documents, not billions) — so its distinct
shingle set is **broadcast**; the training side streams through a
map-side semi-join with zero shuffle of corpus bytes. The only wide
operation is the per-doc overlap count aggregation, keyed on doc_id,
after the broadcast join has already discarded every clean shingle.
A 100 TB corpus therefore pays one scan + one (doc_id) partial-agg
shuffle whose input is only the contaminated shingle hits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logminer_kafka_connect_spark.operators.textops import ensure_compute_parallelism
from logminer_kafka_connect_spark.operators.textops.dedup import shingles_expr


def decontaminate(
    train: DataFrame,
    evalset: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-training-doc overlap report vs the eval set's k-gram universe.

    Returns (id_col, n_shared_shingles, n_shingles, share_ratio) for
    contaminated docs only — the anti-join complement is the clean set.
    """
    eval_sh = (
        evalset.select(F.explode(shingles_expr(text_col, k)).alias("shingle"))
        .distinct()
    )
    train_sh = ensure_compute_parallelism(train).select(
        F.col(id_col),
        F.explode(shingles_expr(text_col, k)).alias("shingle"),
        F.size(shingles_expr(text_col, k)).alias("n_shingles"),
    )
    hits = train_sh.join(F.broadcast(eval_sh), "shingle")
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_shared_shingles"),
        F.first("n_shingles").cast("long").alias("n_shingles"),
        F.round(F.count(F.lit(1)) / F.first("n_shingles"), 6).alias("share_ratio"),
    )
