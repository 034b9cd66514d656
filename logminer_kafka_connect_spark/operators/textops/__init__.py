"""Training-data pipeline operators over document/embedding tables.

Not in the reference (its payload is opaque); required as first-class
components for the 100 TB web-text target: deduplication (exact, MinHash-
LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity search
(brute-force + LSH-bucketed ANN), text analysis (language id, quality
score, token counts, fingerprinting), and multimodal column plumbing.

Design rule: JVM-side built-ins wherever the semantics allow (all hashing
is ``md5``-derived so DuckDB oracles can replicate bit-for-bit); Python
appears only in Arrow-vectorized UDFs (ANN hyperplanes, fake decoders).
"""

from pyspark.sql import DataFrame


def ensure_compute_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Input-skew guard for compute-heavy operators (guide §2.5: "one huge
    unsplittable file ... repartition immediately after the read").

    A single-row-group parquet file yields ONE scan partition no matter how
    many cores the session has, and Spark fuses downstream per-row compute
    (shingling, per-shingle md5, vector math) into that scan — the whole
    operator then runs on one task (measured: 3-5.5 s single-task stages
    under d23/d18 at sf0.1 while 31 cores idled). Repartition up to
    ``factor x defaultParallelism`` when the plan yields fewer partitions;
    a no-op at scale, where scans of real multi-split inputs already carry
    enough partitions. Round-robin repartition is retry-safe (Spark sorts
    before repartitioning) and every caller is an aggregation, so results
    are partitioning-independent.
    """
    try:
        cur = df.rdd.getNumPartitions()
        target = df.sparkSession.sparkContext.defaultParallelism * factor
    except Exception:  # non-materializable plan (e.g. streaming source)
        return df
    if cur < target:
        return df.repartition(target)
    return df
