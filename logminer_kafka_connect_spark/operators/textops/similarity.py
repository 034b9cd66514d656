"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products run JVM-side via ``aggregate(zip_with(...))`` inside
  whole-stage codegen; the q×n pair space is a (broadcast) join, so it
  distributes, but it is O(q·n) — fine for re-ranking, not for full ANN.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane LSH. A
  deterministic seeded hyperplane matrix (generated per executor from the
  seed, numpy) signs each vector into a bucket via one Arrow-vectorized
  pandas UDF; candidates are co-bucketed vectors (multi-probe via several
  independent tables), exact cosine re-ranks within buckets. Pair work
  scales with bucket occupancy, not n².
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from logminer_kafka_connect_spark.operators.textops import ensure_compute_parallelism


def with_norm(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return emb.select(F.col(id_col), F.col(vec_col), norm.alias("_norm"))


def cosine_expr(a: str, b: str, vec_col: str):
    dot = F.aggregate(
        F.zip_with(
            F.col(f"{a}.{vec_col}"),
            F.col(f"{b}.{vec_col}"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    return dot / (F.col(f"{a}._norm") * F.col(f"{b}._norm"))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self).

    ``queries`` is broadcast (the small side); candidates stream past it,
    ranked with one window per query id.
    """
    q = with_norm(queries, id_col, vec_col).alias("q")
    c = with_norm(ensure_compute_parallelism(emb), id_col, vec_col).alias("c")
    scored = (
        c.join(F.broadcast(q), F.col(f"q.{id_col}") != F.col(f"c.{id_col}"))
        .withColumn("cosine", F.round(cosine_expr("q", "c", vec_col), 6))
        .select(
            F.col(f"q.{id_col}").alias("query_id"),
            F.col(f"c.{id_col}").alias("neighbor_id"),
            "cosine",
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(seed: int, n_tables: int, n_planes: int, dim: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_planes, dim)).astype(np.float64)


def bucket_signatures(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    n_tables: int = 4,
    n_planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """(id, table, bucket) — random-hyperplane signs per LSH table.

    The hyperplane matrix is regenerated deterministically from ``seed``
    inside each Arrow batch (no driver-side broadcast payload needed).
    ``dim`` defaults to the batch's own vector length — same matrix on
    every executor since all vectors share a dimension — so no driver-side
    ``.first()`` sniff job runs (it cost two extra jobs per call).
    """

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def sig_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        planes = _hyperplanes(seed, n_tables, n_planes, dim or mat.shape[1])
        out = []
        signs = (np.einsum("tpd,bd->tbp", planes, mat) > 0).astype(np.int64)
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        buckets = (signs * weights).sum(axis=2)  # (tables, batch)
        for b in range(mat.shape[0]):
            out.append([int(buckets[t, b]) for t in range(n_tables)])
        return pd.Series(out)

    # Guide §4.4: downstream null-filters/explodes push below the
    # parallelism repartition and DUPLICATE the ArrowEvalPython node —
    # observed as sig_udf evaluated twice per side in the d18_lsh /
    # ann_lsh_bucketed / ann_recall plans. The UDF is pure; the marking
    # pins a single evaluation (after the repartition, where it spreads
    # across cores).
    sig = ensure_compute_parallelism(emb).select(
        F.col(id_col),
        F.col(vec_col),
        sig_udf.asNondeterministic()(F.col(vec_col)).alias("sigs"),
    )
    return sig.select(
        id_col,
        vec_col,
        F.posexplode("sigs"),
    ).withColumnsRenamed({"pos": "table", "col": "bucket"})


def lsh_bucketed_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    n_tables: int = 4,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing any LSH bucket with
    the query in any table; exact cosine re-rank within candidates."""
    cb = bucket_signatures(emb, id_col, vec_col, seed, n_tables, n_planes)
    qb = bucket_signatures(queries, id_col, vec_col, seed, n_tables, n_planes)

    cands = (
        qb.alias("q")
        .join(
            cb.alias("c"),
            (F.col("q.table") == F.col("c.table"))
            & (F.col("q.bucket") == F.col("c.bucket"))
            & (F.col(f"q.{id_col}") != F.col(f"c.{id_col}")),
        )
        .select(
            F.col(f"q.{id_col}").alias("query_id"),
            F.col(f"q.{vec_col}").alias("qv"),
            F.col(f"c.{id_col}").alias("neighbor_id"),
            F.col(f"c.{vec_col}").alias("cv"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.col(c), F.lit(0.0).cast("double"), lambda a, x: a + x.cast("double") * x.cast("double"))
    )
    scored = cands.withColumn("cosine", F.round(dot / (norm("qv") * norm("cv")), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def assign_ivf_clusters(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF assignment: each vector joins its nearest centroid (max cosine,
    centroid id as tie-break). Centroids broadcast (small side); the scan is
    one linear pass — the build stage of an IVF-Flat index. Returns
    (id, vec, cluster)."""
    c = with_norm(centroids, id_col, vec_col).select(
        F.col(id_col).alias("centroid_id"),
        F.col(vec_col).alias("cv"),
        F.col("_norm").alias("cnorm"),
    )
    v = with_norm(ensure_compute_parallelism(emb), id_col, vec_col)
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("cv"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    scored = v.join(F.broadcast(c)).withColumn(
        "sim", dot / (F.col("_norm") * F.col("cnorm"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, F.col("centroid_id").alias("cluster"))
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat approximate top-k: deterministic centroids (the first
    ``n_centroids`` corpus vectors by id — fully SQL-expressible, so a
    DuckDB oracle hash-verifies the whole pipeline), each vector assigned
    to its nearest centroid, each query probing its ``n_probe`` nearest
    inverted lists, exact cosine re-rank within the probed lists.

    100 TB shape: the candidate join is an equi-join on ``cluster`` (the
    inverted-list bucketing), so per-query work scales with the probed
    lists, not the corpus; assignment is one linear broadcast-join pass
    that would be written once and reused across queries.
    """
    centroids = emb.filter(F.col(id_col) < n_centroids)
    assigned = assign_ivf_clusters(emb, centroids, id_col, vec_col)

    # query -> its n_probe nearest centroid lists
    c = with_norm(centroids, id_col, vec_col).select(
        F.col(id_col).alias("centroid_id"),
        F.col(vec_col).alias("cv"),
        F.col("_norm").alias("cnorm"),
    )
    q = with_norm(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), F.col("_norm").alias("qnorm")
    )
    dotqc = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("centroid_id"))
    probes = (
        q.join(F.broadcast(c))
        .withColumn("sim", dotqc / (F.col("qnorm") * F.col("cnorm")))
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "qv", "qnorm", F.col("centroid_id").alias("cluster"))
    )

    cands = probes.join(assigned, "cluster").filter(
        F.col("query_id") != F.col(id_col)
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col(vec_col), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    norm_c = F.sqrt(
        F.aggregate(
            F.col(vec_col), F.lit(0.0).cast("double"),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )
    )
    scored = cands.withColumn("cosine", F.round(dot / (F.col("qnorm") * norm_c), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cosine", "rank")
    )


def lsh_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    n_tables: int = 12,
    n_planes: int = 4,
) -> DataFrame:
    """Embedding-cosine near-dup pairs at scale: candidates are co-bucketed
    vectors (random-hyperplane LSH, multi-table), verified with exact
    cosine — pair work scales with bucket occupancy, not n² (the scale path
    behind the exact `embedding_near_dups` baseline in textops.dedup;
    recall vs that baseline is pinned in tests/test_textops.py)."""
    b = bucket_signatures(emb, id_col, vec_col, seed, n_tables, n_planes)
    cands = (
        b.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"a.{vec_col}").alias("va"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"b.{vec_col}").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.col(c), F.lit(0.0).cast("double"), lambda a, x: a + x.cast("double") * x.cast("double"))
    )
    return (
        cands.withColumn("cosine", F.round(dot / (norm("va") * norm("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def kmeans_step(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd step of spherical k-means, as a relational plan: assign
    every vector to its nearest centroid (max cosine, reusing the IVF
    assignment join — broadcast centroids, one linear pass), then compute
    the per-(cluster, dim) mean via posexplode + one partial-agg shuffle
    keyed on (cluster, dim).

    Returns (cluster, dim, n_vectors, mean_val) — the un-normalized new
    centroid coordinates in long form (n_vectors repeats per dim). Long
    form keeps the whole step SQL-expressible (the DuckDB oracle zips
    unnest(embedding) with unnest(range(len))) and the shuffle key
    (cluster, dim) fine-grained enough that even a heavily skewed cluster
    spreads over dims x partitions."""
    assigned = assign_ivf_clusters(emb, centroids, id_col, vec_col)
    expl = assigned.select(
        "cluster", F.posexplode(F.col(vec_col)).alias("dim", "val")
    )
    return expl.groupBy("cluster", "dim").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg(F.col("val").cast("double")), 5).alias("mean_val"),
    )


def spherical_kmeans(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Iterated Lloyd steps (spherical k-means: means are re-normalized
    by the cosine in the next assignment). Centroids round-trip through
    the driver between iterations — k x dim floats, a few KB; the data
    never leaves the cluster. Returns (final centroids DataFrame,
    per-iteration mean within-cluster cosine list)."""
    spark = emb.sparkSession
    cent = emb.filter(F.col(id_col) < k).select(id_col, vec_col)
    history: list[float] = []
    for _ in range(n_iter):
        assigned = assign_ivf_clusters(emb, cent, id_col, vec_col)
        # objective: mean cosine of each vector to its centroid
        c = with_norm(cent, id_col, vec_col).select(
            F.col(id_col).alias("cluster"),
            F.col(vec_col).alias("cv"),
            F.col("_norm").alias("cnorm"),
        )
        vnorm = F.sqrt(
            F.aggregate(
                F.col(vec_col),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        )
        v = assigned.select(id_col, vec_col, "cluster", vnorm.alias("_norm"))
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col), F.col("cv"),
                lambda x, y: x.cast("double") * y.cast("double"),
            ),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
        scored = v.join(F.broadcast(c), ["cluster"])
        history.append(
            scored.select(
                F.avg(dot / (F.col("_norm") * F.col("cnorm"))).alias("o")
            ).collect()[0]["o"]
        )
        means = assigned.select(
            "cluster", F.posexplode(F.col(vec_col)).alias("dim", "val")
        ).groupBy("cluster", "dim").agg(
            F.round(F.avg(F.col("val").cast("double")), 5).alias("mean_val")
        )
        rows = means.collect()
        by_c: dict[int, list] = {}
        for r in rows:
            by_c.setdefault(r["cluster"], []).append((r["dim"], r["mean_val"]))
        data = [
            (int(cid), [float(m) for _, m in sorted(dims)])
            for cid, dims in sorted(by_c.items())
        ]
        cent = spark.createDataFrame(data, f"{id_col} long, {vec_col} array<float>")
    return cent, history


# ----------------------------------------------------------------- PQ/ADC
def pq_train(sample: np.ndarray, m: int = 8, n_centroids: int = 16, iters: int = 10) -> np.ndarray:
    """Train product-quantization codebooks (Jégou et al., 'Product
    Quantization for Nearest Neighbor Search'): split the d dims into m
    subspaces and run Lloyd k-means per subspace on a DRIVER-SIDE sample
    (numpy). Deterministic: vectors are L2-normalized, init is the first
    ``n_centroids`` sample rows per subspace, ties resolve by argmin.
    Codebook training is sample-based at any scale (FAISS trains on
    1e5-1e6 vectors for billion-vector indexes) — the distributed parts
    are encode and search, not train. Returns (m, n_centroids, d/m)."""
    n, d = sample.shape
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    if n < n_centroids:
        raise ValueError(f"sample of {n} too small for {n_centroids} centroids")
    ds = d // m
    X = sample / np.clip(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12, None)
    books = np.empty((m, n_centroids, ds), dtype=np.float64)
    for j in range(m):
        sub = X[:, j * ds : (j + 1) * ds]
        cents = sub[:n_centroids].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(n_centroids):
                mask = assign == c
                if mask.any():
                    cents[c] = sub[mask].mean(0)
        books[j] = cents
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector to m subspace centroid ids — float[d] becomes
    int[m] (32x smaller at d=64/m=8 vs float32; byte-packable further).
    One Arrow-vectorized pandas UDF pass with the codebooks shipped in
    the closure (broadcast once per executor); narrow plan, no shuffle.
    Vectors are L2-normalized first so ADC L2 order == cosine order."""
    cb = codebooks
    m, _, ds = cb.shape

    @F.pandas_udf("array<int>")
    def enc(col: pd.Series) -> pd.Series:
        X = np.stack(col.to_numpy()).astype(np.float64)
        X /= np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-12, None)
        out = np.empty((len(X), m), dtype=np.int32)
        for j in range(m):
            sub = X[:, j * ds : (j + 1) * ds]
            d2 = ((sub[:, None, :] - cb[j][None, :, :]) ** 2).sum(-1)
            out[:, j] = d2.argmin(1)
        return pd.Series(list(out))

    return emb.select(F.col(id_col), enc(F.col(vec_col)).alias("codes"))


def pq_topk(
    codes: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 3,
    shortlist: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ/ADC approximate top-k with exact re-rank — the memory-bound ANN
    path: search touches only the int[m] codes (the corpus' float vectors
    never stream through the ranking scan), each query pre-computes an
    (m × n_centroids) subspace distance table and scores a vector with m
    table lookups (asymmetric distance computation). Per input partition
    only the ``shortlist`` best candidates per query are EMITTED (a local
    argpartition inside the UDF), so the shuffle is O(partitions × q ×
    shortlist), not O(q × n); the global shortlist then re-ranks with
    exact cosine against the (id-joined) true vectors. Queries are
    collected driver-side (bounded: the q side of any top-k API).

    L2-normalized train/encode makes ADC-L2 order == cosine order
    (||a-b||² = 2 - 2cos), so the exact baseline for recall is
    ``cosine_topk``."""
    cb = codebooks
    m, kc, ds = cb.shape
    qrows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in qrows])
    Q /= np.clip(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12, None)
    # T[qi, j, c] = ||q_sub - centroid||² for subspace j, centroid c
    T = np.stack(
        [
            ((Q[:, j * ds : (j + 1) * ds][:, None, :] - cb[j][None, :, :]) ** 2).sum(-1)
            for j in range(m)
        ],
        axis=1,
    )

    def score(parts):
        for pdf in parts:
            if not len(pdf):
                continue
            C = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            ids = pdf[id_col].to_numpy()
            cols = np.arange(m)
            for qi in range(len(q_ids)):
                d = T[qi][cols[None, :], C].sum(1)
                keep = min(shortlist, len(d))
                idx = np.argpartition(d, keep - 1)[:keep]
                yield pd.DataFrame(
                    {
                        "query_id": q_ids[qi],
                        id_col: ids[idx],
                        "adc": d[idx],
                    }
                )

    scored = codes.mapInPandas(score, schema=f"query_id long, {id_col} long, adc double")
    wq = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc(id_col))
    short = (
        scored.filter(F.col("query_id") != F.col(id_col))
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= shortlist)
        .drop("__rn", "adc")
    )
    # exact cosine re-rank of the shortlist against the true vectors
    qn = with_norm(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), F.col("_norm").alias("qnorm")
    )
    cn = with_norm(emb, id_col, vec_col).select(
        F.col(id_col), F.col(vec_col).alias("cv"), F.col("_norm").alias("cnorm")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        short.join(qn, "query_id")
        .join(cn, id_col)
        .withColumn("cosine", F.round(dot / (F.col("qnorm") * F.col("cnorm")), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cosine", "rank")
    )
