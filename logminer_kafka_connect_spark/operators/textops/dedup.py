"""Deduplication operators over a documents table.

Scale notes (the point of each design):

- **exact**: one hash-aggregate on ``md5(text)`` — map-side partial agg,
  no pairwise work. O(n) shuffle of (hash, id).
- **MinHash + LSH**: signatures via per-shingle ``md5`` minima (k
  independent orderings from salted hashes), banded into buckets; only
  documents sharing a band bucket are pair-joined. Pair candidates scale
  with bucket collision rate, not n² — the standard web-dedup shape
  (Broder; see PAPERS.md). The band join is a shuffle on (band, key)
  with AQE skew splitting for pathological buckets.
- **SimHash**: 16-bit signature by hex-nibble voting; near-dups share the
  signature (or a small Hamming ball — here: exact signature buckets).
  One explode + one aggregation; no joins.
- **n-gram Jaccard**: exact verification used on LSH candidates (and
  directly at small scale): |A∩B| via a shingle-level self-join restricted
  to candidate pairs, |A∪B| from per-doc distinct counts.

All hashes are ``md5`` so a DuckDB oracle reproduces results exactly
(xxhash64 exists only on the Spark side).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logminer_kafka_connect_spark.operators.textops import ensure_compute_parallelism


def words_expr(text_col: str):
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def shingles_expr(text_col: str, k: int = 3):
    """Distinct word k-gram shingles of a document (order-preserving)."""
    w = words_expr(text_col)
    return F.array_distinct(
        F.when(
            F.size(w) >= k,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - k),
                lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", w)))
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: (text_hash, keeper = min id, n_dups)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def doc_shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    # the explode + per-shingle md5 downstream is the suite's heaviest
    # per-row compute — never let a single unsplittable input file
    # serialize it (no-op on well-split inputs)
    df = ensure_compute_parallelism(df)
    return df.select(
        F.col(id_col), F.explode(shingles_expr(text_col, k)).alias("shingle")
    )


#: modulus for the derived minhash orderings (Mersenne prime 2^31-1 —
#: products stay far below 2^63, so Spark long arithmetic and DuckDB BIGINT
#: arithmetic agree exactly with no overflow on either engine)
MINHASH_P = 2_147_483_647


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 12,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash signature: h_i(doc) = min over shingles of g_i(s), where
    g_i(s) = (v1(s) + i * v2(s)) mod P and v1/v2 are two independent
    32-bit lanes of ONE ``md5(s)`` digest.

    Kirsch–Mitzenmacher double hashing: k orderings derived from a single
    digest per shingle — the r3 design salted md5 k times per shingle
    occurrence, making the signature aggregation the most expensive
    headline stage (12 full digests per shingle; r3 VERDICT Next #4). One
    digest + 12 integer fused multiply-adds is ~6x cheaper and every step
    (substr, hex->int, mod) is expressible identically in the DuckDB
    oracle. One explode + one grouped agg, map-side partial min.
    """
    sh = doc_shingles(df, id_col, text_col, shingle_k)
    d = F.md5(F.col("shingle"))
    v1 = F.conv(F.substring(d, 1, 8), 16, 10).cast("long")
    v2 = F.conv(F.substring(d, 9, 8), 16, 10).cast("long")
    aggs = [
        F.min((v1 + F.lit(i) * v2) % F.lit(MINHASH_P)).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def band_buckets(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 12,
    n_bands: int = 4,
) -> DataFrame:
    """(id, band, bkey): one bucket row per band of the signature."""
    rows_per_band = n_hashes // n_bands
    bands = []
    for b in range(n_bands):
        cols = [
            F.col(f"mh{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        bands.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("bkey"))
        )
    return signatures.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("bb")
    ).select(id_col, "bb.band", "bb.bkey")


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 12,
    n_bands: int = 4,
) -> DataFrame:
    """Band the signature; docs sharing any band bucket become candidates."""
    buckets = band_buckets(signatures, id_col, n_hashes, n_bands)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (all co-shingled pairs
    when ``pairs`` is None — the brute n-gram dedup path at small scale).

    With ``pairs``, verification cost scales with |candidates|, NOT corpus²:
    shingles are first semi-joined to the candidate-id set, per-candidate
    shingle sets are collected once, and each candidate pair computes
    |A∩B| via ``array_intersect`` — no unrestricted shingle self-join
    anywhere in the plan (that self-join is O(Σ per-shingle occurrences²)
    over the whole corpus and defeats the point of LSH banding)."""
    sh = doc_shingles(df, id_col, text_col, shingle_k)

    if pairs is not None:
        ids = (
            pairs.select(F.col("id_a").alias(id_col))
            .union(pairs.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        # per-candidate shingle sets (shingles_expr already emits distinct
        # shingles, so collect_set size == the distinct-shingle count);
        # persisted: consumed twice (id_a side and id_b side of the pair
        # join) and bounded by |candidate docs|, not the corpus
        sets = (
            sh.join(ids, id_col, "left_semi")
            .groupBy(id_col)
            .agg(F.collect_set("shingle").alias("sh_set"))
            .persist()
        )
        a = sets.select(F.col(id_col).alias("id_a"), F.col("sh_set").alias("set_a"))
        b = sets.select(F.col(id_col).alias("id_b"), F.col("sh_set").alias("set_b"))
        out = (
            pairs.join(a, "id_a")
            .join(b, "id_b")
            .withColumn("n_inter", F.size(F.array_intersect("set_a", "set_b")))
            .filter(F.col("n_inter") > 0)
            .withColumn(
                "jaccard",
                F.round(
                    F.col("n_inter")
                    / (F.size("set_a") + F.size("set_b") - F.col("n_inter")),
                    6,
                ),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
        # Materialize the (small) verified-pair result eagerly, then drop
        # the cached shingle sets — otherwise repeated calls in a
        # long-lived session accumulate cached partitions forever (r2
        # ADVICE; CacheManager never GCs explicit persists).
        # LMKC_EXPLAIN=1 (scripts/explain_plans.py) skips the
        # materialization so the full verification plan — the LeftSemi
        # below the shingle aggregation that makes this candidate-bounded —
        # stays visible in explain output; in that mode the persisted sets
        # survive until session end, which a plan-dump session accepts.
        if os.environ.get("LMKC_EXPLAIN") == "1":
            return out
        out = out.localCheckpoint(eager=True)
        sets.unpersist()
        return out

    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))  # shingles distinct already
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    out = (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 12,
    n_bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Full pipeline: signatures -> banded candidates -> exact-Jaccard
    verification. Returns verified near-dup pairs (id_a, id_b, jaccard)."""
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k)
    # The candidate set is tiny (collision pairs) but its lineage is the
    # whole signature pipeline; downstream it is consumed three times
    # (id_a ids, id_b ids, final pair join) — persist, or the shingle+md5
    # work reruns per consumer.
    cands = lsh_candidate_pairs(sigs, id_col, n_hashes, n_bands).persist()
    # jaccard_pairs materializes its result eagerly (localCheckpoint), so
    # the candidate cache can be dropped before returning — no persisted
    # blocks outlive the call (r2 ADVICE hygiene item)
    out = jaccard_pairs(df, cands, id_col, text_col, shingle_k, threshold)
    cands.unpersist()
    return out


def simhash16(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """16-bit SimHash by per-word md5 hex-nibble voting.

    Bit j is set when the sum over word occurrences of ±1 (nibble j of
    md5(word) >= 8) is positive. Identical signatures bucket near-dups.
    """
    w = ensure_compute_parallelism(df).select(
        F.col(id_col), F.explode(words_expr(text_col)).alias("word")
    )
    h = w.withColumn("h", F.md5("word"))
    votes = [
        F.sum(
            F.when(
                F.instr(F.lit("0123456789abcdef"), F.substring("h", j + 1, 1)) >= 9,
                F.lit(1),
            ).otherwise(F.lit(-1))
        ).alias(f"v{j}")
        for j in range(16)
    ]
    agg = h.groupBy(id_col).agg(*votes)
    sig = None
    for j in range(16):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return agg.select(F.col(id_col), sig.cast("int").alias("simhash"))


def embedding_near_dups(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute force — see similarity.py for
    the LSH-bucketed scale path)."""
    from logminer_kafka_connect_spark.operators.textops.similarity import (
        with_norm,
        cosine_expr,
    )

    emb = ensure_compute_parallelism(emb)
    a = with_norm(emb, id_col, vec_col).alias("a")
    b = with_norm(emb, id_col, vec_col).alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .withColumn("cosine", F.round(cosine_expr("a", "b", vec_col), 6))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "cosine",
        )
    )


def incremental_minhash_dedup(
    base: DataFrame,
    delta: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 12,
    n_bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.2,
    base_signatures: DataFrame | None = None,
) -> DataFrame:
    """Delta-vs-base near-dup detection: which INCOMING documents
    near-duplicate something already in the corpus.

    The CDC-ingest dedup shape: a batch of changed/new pages (``delta``)
    is checked against the standing corpus (``base``) without ever
    generating base-base or delta-delta pairs — the candidate join is
    strictly ``base_buckets ⋈ delta_buckets``, so candidate volume scales
    with |delta| x bucket-collision-rate, not |corpus|². Pass
    ``base_signatures`` (a stored minhash_signatures output — per-doc
    aggregates, incrementally maintainable on merge) to skip re-hashing
    the standing corpus entirely: the production loop pays only the
    delta's signature pass per batch.

    Returns (base_id, delta_id, jaccard >= threshold) exact-verified
    pairs, verification candidate-bounded via jaccard_pairs.
    """
    sig_b = (
        base_signatures
        if base_signatures is not None
        else minhash_signatures(base, id_col, text_col, n_hashes, shingle_k)
    )
    sig_d = minhash_signatures(delta, id_col, text_col, n_hashes, shingle_k)
    bb = band_buckets(sig_b, id_col, n_hashes, n_bands).alias("b")
    bd = band_buckets(sig_d, id_col, n_hashes, n_bands).alias("d")
    cand = (
        bb.join(
            bd,
            (F.col("b.band") == F.col("d.band")) & (F.col("b.bkey") == F.col("d.bkey")),
        )
        .select(
            F.col(f"b.{id_col}").alias("id_a"), F.col(f"d.{id_col}").alias("id_b")
        )
        .distinct()
    )
    both = base.select(id_col, text_col).unionByName(delta.select(id_col, text_col))
    verified = jaccard_pairs(
        both, pairs=cand, id_col=id_col, text_col=text_col,
        shingle_k=shingle_k, threshold=threshold,
    )
    return verified.select(
        F.col("id_a").alias("base_id"), F.col("id_b").alias("delta_id"), "jaccard"
    )


def semdedup_prune(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """SemDedup-style semantic pruning: label every item kept/dropped,
    dropping each item that has ANY smaller-id near-duplicate above the
    cosine threshold (deterministic min-id-representative rule — the
    greedy keep-one policy of Abbas et al.'s SemDedup, with id order
    standing in for the cluster-centroid-distance order).

    ``pairs=`` accepts precomputed candidate pairs (id_a < id_b, already
    thresholded) so the 100-TB path feeds LSH-bucketed + verified pairs
    (similarity.lsh_near_dups) instead of the brute-force default, which
    exists as the small-scale oracle baseline. The victim set is one
    DISTINCT on id_b — proportional to the dup rate, not the corpus — so
    the final membership join broadcasts at any realistic dup rate.
    """
    if pairs is None:
        pairs = embedding_near_dups(emb, id_col, vec_col, threshold)
    victims = (
        pairs.select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    return emb.select(id_col).join(victims, id_col, "left").select(
        id_col, F.col("__dropped").isNull().alias("kept")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """ASYMMETRIC shingle containment c(a -> b) = |A∩B| / |A| — the
    doc-inside-doc detector Jaccard misses: a short document wholly
    quoted by a long one has tiny Jaccard (union is dominated by the
    long doc) but containment 1.0. Directed: (id_a, id_b, containment)
    means id_a's shingles are covered by id_b's. One co-shingle
    equi-join computed once per unordered pair, then both directions
    derived from the same intersection count — the brute small-scale
    path (at scale, feed LSH candidates through the same arithmetic as
    jaccard_pairs(pairs=...))."""
    sh = doc_shingles(df, id_col, text_col, shingle_k)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("lo"), F.col(f"b.{id_col}").alias("hi"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    n_lo = sizes.select(F.col(id_col).alias("lo"), F.col("n").alias("n_lo"))
    n_hi = sizes.select(F.col(id_col).alias("hi"), F.col("n").alias("n_hi"))
    both = inter.join(n_lo, "lo").join(n_hi, "hi")
    fwd = both.select(
        F.col("lo").alias("id_a"),
        F.col("hi").alias("id_b"),
        F.round(F.col("n_inter") / F.col("n_lo"), 6).alias("containment"),
    )
    rev = both.select(
        F.col("hi").alias("id_a"),
        F.col("lo").alias("id_b"),
        F.round(F.col("n_inter") / F.col("n_hi"), 6).alias("containment"),
    )
    return fwd.unionByName(rev).filter(F.col("containment") >= threshold)
