"""Heavy hitters (frequent items): exact top-k and a Misra-Gries sketch
with exact recount.

The exact path is one full (item) groupBy — a shuffle whose width is the
whole vocabulary. The sketch path is the 100-TB shape:

1. **Per-partition Misra-Gries summaries** (mapInPandas, ``n_counters``
   counters each): a narrow pass, nothing shuffled.
2. **Mergeable-summaries combine** (Agarwal et al., "Mergeable Summaries",
   PODS'12): union the partial counters; if more than ``n_counters``
   survive, subtract the (n_counters+1)-th largest count from all and
   drop the non-positive — the merged summary keeps the MG guarantee:
   every item with true frequency > n / (n_counters + 1) is present.
   Partials are tiny (≤ n_counters rows each), so the combine is
   driver-side here; at extreme partition counts the same merge runs as
   a tree (it is associative).
3. **Exact recount** of the surviving candidates: one broadcast semi-join
   + aggregation where only candidate occurrences reach the shuffle.

Result: exact counts for a candidate set guaranteed to contain every
true heavy hitter — the final top-k equals the exact top-k whenever the
k-th item's frequency clears the MG threshold (pinned in tests).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logminer_kafka_connect_spark.operators.textops.bloom import (
    TREE_MERGE_GROUPS,
    TREE_MERGE_THRESHOLD,
)


def mg_merge(counts: dict, n_counters: int) -> dict:
    """Generalized Misra-Gries decrement: keep at most ``n_counters``
    entries by subtracting the (n_counters+1)-th largest count."""
    if len(counts) <= n_counters:
        return counts
    by_count = sorted(counts.values(), reverse=True)
    delta = by_count[n_counters]
    return {item: c - delta for item, c in counts.items() if c > delta}


def exact_top_k(df: DataFrame, col: str, k: int) -> DataFrame:
    """Full groupBy baseline: (item, n) for the k most frequent, total
    order (n desc, item asc) so results are deterministic under ties."""
    return (
        df.groupBy(F.col(col).cast("string").alias("item"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("item"))
        .limit(k)
    )


def heavy_hitters_sketch(
    df: DataFrame, col: str, k: int, n_counters: int | None = None
) -> DataFrame:
    """Top-k frequent items via Misra-Gries candidates + exact recount.

    ``n_counters`` defaults to 8k — comfortably above the k-th item's
    frequency threshold for Zipf-shaped data.
    """
    n_counters = n_counters or 8 * k
    items = df.select(F.col(col).cast("string").alias("item"))

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for b in batches:
            for item, c in b["item"].value_counts().items():
                counts[item] = counts.get(item, 0) + int(c)
            counts = mg_merge(counts, n_counters)
        if counts:
            yield pd.DataFrame(
                {"item": list(counts), "c": [counts[i] for i in counts]}
            )

    def summary_merge(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for b in pdfs:
            for item, c in zip(b["item"], b["c"]):
                counts[item] = counts.get(item, 0) + int(c)
        counts = mg_merge(counts, n_counters)
        if counts:
            yield pd.DataFrame(
                {"item": list(counts), "c": [counts[i] for i in counts]}
            )

    partials_df = items.mapInPandas(partial, schema="item string, c long")
    if items.rdd.getNumPartitions() > TREE_MERGE_THRESHOLD:
        # executor-side tree level: group COMPLETE per-partition summaries
        # (spark_partition_id survives the narrow mapInPandas, so rows of
        # one summary stay together) and MG-merge each group — the
        # mergeable-summaries guarantee needs whole summaries per merge,
        # which is why this is a groupBy on producing partition, not a
        # blind repartition of rows. Driver then sees <= G summaries.
        partials_df = (
            partials_df.withColumn(
                "g", F.spark_partition_id() % TREE_MERGE_GROUPS
            )
            .groupBy("g")
            .applyInPandas(
                lambda pdf: next(summary_merge(iter([pdf])), pd.DataFrame({"item": [], "c": []})),
                schema="item string, c long",
            )
        )
    merged: dict = {}
    for r in partials_df.collect():
        merged[r["item"]] = merged.get(r["item"], 0) + r["c"]
    merged = mg_merge(merged, n_counters)

    spark = df.sparkSession
    cand = spark.createDataFrame([(i,) for i in merged], "item string")
    return (
        items.join(F.broadcast(cand), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("item"))
        .limit(k)
    )
